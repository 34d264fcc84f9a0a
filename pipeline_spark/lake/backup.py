"""Table backup / restore (K9) — base + incremental snapshot export.

The reference backs its tables up with base+incremental S3 exports
(``af/analysis/ooni_db_backup.py:51-62``). Lake-table form: data files are
immutable and content-addressed by path, so a backup is (a) the current
snapshot's metadata JSON and (b) a copy of every data file the snapshot
references that the backup target does not already hold — an incremental
backup after compaction copies only the rewritten files. Restore
materializes a registered snapshot as a fresh, readable table root.

Driver-side file ops only (no Spark jobs) — backups are metadata-scale
work; the bytes move through a thread pool.
"""

from __future__ import annotations

import json
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

from pipeline_spark.lake.table import DATA_DIR, META_DIR, LakeTable


def backup_table(table: LakeTable, target: str) -> dict:
    """Back up the CURRENT snapshot into ``target`` (incremental: data
    files already present from a previous backup are not re-copied)."""
    meta = table.meta()
    os.makedirs(os.path.join(target, "files"), exist_ok=True)
    os.makedirs(os.path.join(target, "snapshots"), exist_ok=True)

    def copy_one(f) -> int:
        dst = os.path.join(target, "files", f["path"])
        if os.path.exists(dst):
            return 0
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(os.path.join(table.path, f["path"]), tmp)
        os.rename(tmp, dst)
        return 1

    with ThreadPoolExecutor(max_workers=16) as ex:
        copied = sum(ex.map(copy_one, meta["files"]))
    snap = os.path.join(target, "snapshots", f"v{meta['version']:08d}.json")
    with open(snap + ".tmp", "w") as f:
        json.dump(meta, f)
    os.rename(snap + ".tmp", snap)
    return {"version": meta["version"], "files_copied": copied, "files_total": len(meta["files"])}


def list_backups(target: str) -> list[int]:
    d = os.path.join(target, "snapshots")
    if not os.path.isdir(d):
        return []
    return sorted(int(n[1:9]) for n in os.listdir(d) if n.startswith("v") and n.endswith(".json"))


def restore_table(spark, target: str, dest_path: str, version: int | None = None) -> LakeTable:
    """Materialize a backed-up snapshot as a fresh table at ``dest_path``."""
    versions = list_backups(target)
    if not versions:
        raise FileNotFoundError(f"no backups at {target}")
    v = versions[-1] if version is None else version
    with open(os.path.join(target, "snapshots", f"v{v:08d}.json")) as f:
        meta = json.load(f)
    os.makedirs(os.path.join(dest_path, META_DIR), exist_ok=True)
    os.makedirs(os.path.join(dest_path, DATA_DIR), exist_ok=True)
    os.makedirs(os.path.join(dest_path, "_lineage"), exist_ok=True)
    for f_entry in meta["files"]:
        src = os.path.join(target, "files", f_entry["path"])
        dst = os.path.join(dest_path, f_entry["path"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
    t = LakeTable(spark, dest_path)
    t._publish(meta, expected_version=meta["version"])
    return t
