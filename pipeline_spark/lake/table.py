"""LakeTable — snapshot-versioned, bucketed, LWW-merge parquet table.

Design notes (scale-first):

* Rows are hash-bucketed on the merge key (``pmod(xxhash64(key), n_buckets)``).
  Data files are either **base** (compacted, ≤1 LWW winner per key) or
  **delta** (one commit's batch winners). At 100 TB, raise ``n_buckets``
  so a bucket is a few GB.
* MERGE is **merge-on-read**: a micro-batch commits only its own in-batch
  LWW winners as per-bucket delta files — the existing table is neither
  read nor rewritten, so write amplification is O(batch), not O(table)
  (copy-on-write rewrote every touched bucket per micro-batch, which at
  Zipf-skewed keys meant rewriting essentially the whole table each
  batch — the measured cause of sub-linear replay scaling in round 1).
  The analog of ReplacingMergeTree's cheap insert + lazy background merge
  (reference ``af/fastpath/fastpath/db.py:82-84``).
* ``scan()`` resolves LWW over base+deltas at read time: only keys present
  in deltas need resolution, so the resolve is a *narrow* argmax over
  (delta keys ∪ their base rows) — payload columns are filtered in place
  by a size-gated broadcast of the winner tuples and never shuffle.
  ``compact()`` folds deltas into base lazily (maintenance, off the
  ingest critical path).
* LWW dedup is a hash aggregation (``max`` over the version struct), so
  Spark performs map-side partial aggregation — hot keys are pre-combined
  on every input partition before the shuffle, which is the scalable form
  of "salting" for aggregations. An explicit two-level salted variant is
  also provided (:func:`pipeline_spark.operators.lww.lww_latest`) and used
  when the key histogram is extremely skewed.
* Commits are atomic: metadata JSON written to a temp name then published
  with ``os.link`` (create-exclusive). Two racing committers → one wins,
  the other retries against the new snapshot. Readers list ``_meta/`` and
  load the highest version — they never observe a partial commit.
* Exactly-once: commit properties carry ``fence.<stream_id> = <batch_id>``.
  A replayed/retried micro-batch with an already-committed fence id is
  skipped *before* any work. This is the snapshot-property epoch fencing
  the north rule asks for (analog of the reference's success-only
  watermark-file advance, ``clickhouse_feeder.py:159-179``).
* Schema evolution: fields carry stable ids; add/rename/widen create a new
  schema version. Data files remember the schema version they were written
  under; the reader resolves old files to the current schema by field id
  (rename = metadata-only, widen = cast-on-read, add = null-fill).

Hidden columns persisted in data files (never exposed by ``read()``):
``_deleted`` (tombstone), ``_vc_epoch`` / ``_vc_offset`` (LWW tie-break),
``_vc_seq`` (commit sequence — breaks *exact* (version, epoch, offset)
ties deterministically in favor of the EARLIER commit, so an unfenced
re-apply of the same event never displaces the already-derived row).
The bucket id is *derivable* from the key, so it is stored only as file
metadata, not as a column.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

META_DIR = "_meta"
DATA_DIR = "data"
LINEAGE_DIR = "_lineage"

HIDDEN_DELETED = "_deleted"
HIDDEN_EPOCH = "_vc_epoch"
HIDDEN_OFFSET = "_vc_offset"
HIDDEN_SEQ = "_vc_seq"
HIDDEN_FIELDS = [
    (HIDDEN_DELETED, "boolean"),
    (HIDDEN_EPOCH, "long"),
    (HIDDEN_OFFSET, "long"),
    (HIDDEN_SEQ, "long"),
]


class CommitConflict(Exception):
    pass


class TableCorruption(Exception):
    """Raised by :meth:`LakeTable.verify_integrity` when the current
    snapshot's manifest disagrees with the filesystem or parquet footers."""


def _field(fid: int, name: str, typ: str) -> dict:
    return {"id": fid, "name": name, "type": typ}


def _stat_key(v):
    """JSON-safe, order-preserving encoding for manifest min/max stats.
    Timestamps become fixed-width UTC ISO strings (lexicographic ==
    chronological), so file bounds and query bounds compare as plain
    values."""
    import datetime

    import pandas as _pd

    if isinstance(v, _pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    return v


def _footer_stats(md, cols: set[str]) -> dict:
    """Per-file min/max for ``cols`` from a parquet footer (Iceberg-style
    manifest column bounds — the metadata is already written by every
    parquet writer; this just lifts it into the snapshot so planning can
    skip files without opening them). A column missing stats in ANY row
    group yields no entry (pruning must only ever see true bounds)."""
    agg: dict[str, list] = {}
    broken: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if name not in cols or name in broken:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                broken.add(name)
                agg.pop(name, None)
                continue
            lo, hi = _stat_key(st.min), _stat_key(st.max)
            cur = agg.get(name)
            if cur is None:
                agg[name] = [lo, hi]
            else:
                cur[0] = min(cur[0], lo)
                cur[1] = max(cur[1], hi)
    return agg


class LakeTable:
    """Handle to a lake table rooted at a local/posix directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._meta_cache: dict | None = None

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: list[tuple[str, str]],
        key: str = "url",
        version_col: str = "warc_ts",
        n_buckets: int = 16,
        overwrite: bool = False,
        resolution: str = "lww",
    ) -> "LakeTable":
        """Create an empty table. ``schema`` is [(name, spark_ddl_type), ...].

        ``resolution`` is the upsert conflict policy (reference
        ``--jsonlmode`` insert-vs-upsert, reprocessor.py:77-97):
        ``"lww"`` keeps the row with max (version_col, epoch, offset);
        ``"first_wins"`` keeps the FIRST arrival per key (min (epoch,
        offset) — insert-only / ON CONFLICT DO NOTHING semantics).
        """
        assert resolution in ("lww", "first_wins")
        meta_dir = os.path.join(path, META_DIR)
        if os.path.exists(meta_dir) and not overwrite:
            raise FileExistsError(f"table exists at {path}")
        if overwrite and os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.makedirs(meta_dir, exist_ok=True)
        os.makedirs(os.path.join(path, DATA_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, LINEAGE_DIR), exist_ok=True)
        fields = [_field(i + 1, n, t) for i, (n, t) in enumerate(schema)]
        meta = {
            "format_version": 1,
            "version": 0,
            "parent": None,
            "schema_version": 1,
            "schemas": {"1": fields},
            "last_field_id": len(fields),
            "key": key,
            "version_col": version_col,
            "n_buckets": n_buckets,
            "resolution": resolution,
            "files": [],
            "properties": {},
        }
        t = cls(spark, path)
        t._publish(meta, expected_version=0)
        return t

    # ------------------------------------------------------------ metadata

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.path, META_DIR, f"v{version:08d}.json")

    def current_version(self) -> int:
        names = [n for n in os.listdir(os.path.join(self.path, META_DIR)) if n.startswith("v") and n.endswith(".json")]
        if not names:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        return max(int(n[1:9]) for n in names)

    def meta(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(self._meta_path(v)) as f:
            return json.load(f)

    def _publish(self, meta: dict, expected_version: int) -> None:
        """Atomic create-exclusive publish of snapshot ``expected_version``."""
        final = self._meta_path(expected_version)
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # fails with EEXIST on concurrent commit
        except FileExistsError as e:
            raise CommitConflict(f"version {expected_version} already committed") from e
        finally:
            os.unlink(tmp)

    def properties(self) -> dict:
        return self.meta().get("properties", {})

    def fence_value(self, stream_id: str) -> int | None:
        v = self.properties().get(f"fence.{stream_id}")
        return None if v is None else int(v)

    # ------------------------------------------------------------- schema

    def _schema_fields(self, meta: dict, schema_version: int | None = None) -> list[dict]:
        sv = schema_version if schema_version is not None else meta["schema_version"]
        return meta["schemas"][str(sv)]

    def spark_schema(self, with_hidden: bool = False) -> T.StructType:
        meta = self.meta()
        fields = self._schema_fields(meta)
        ddl = ", ".join(f"{f['name']} {f['type']}" for f in fields)
        if with_hidden:
            ddl += ", " + ", ".join(f"{n} {t}" for n, t in HIDDEN_FIELDS)
        return T._parse_datatype_string(ddl)

    def _evolve(self, mutate) -> None:
        """Apply a schema mutation as a new snapshot (metadata-only commit)."""
        while True:
            meta = self.meta()
            new = json.loads(json.dumps(meta))
            sv = meta["schema_version"] + 1
            fields = json.loads(json.dumps(self._schema_fields(meta)))
            mutate(new, fields)
            new["schemas"][str(sv)] = fields
            new["schema_version"] = sv
            new["parent"] = meta["version"]
            new["version"] = meta["version"] + 1
            try:
                self._publish(new, new["version"])
                return
            except CommitConflict:
                continue

    def add_column(self, name: str, typ: str) -> None:
        def mutate(meta, fields):
            if any(f["name"] == name for f in fields):
                raise ValueError(f"column {name} exists")
            meta["last_field_id"] += 1
            fields.append(_field(meta["last_field_id"], name, typ))

        self._evolve(mutate)

    def rename_column(self, old: str, new: str) -> None:
        def mutate(meta, fields):
            for f in fields:
                if f["name"] == old:
                    f["name"] = new
                    return
            raise ValueError(f"no column {old}")

        self._evolve(mutate)

    def widen_column(self, name: str, new_type: str) -> None:
        allowed = {("int", "long"), ("int", "bigint"), ("float", "double"), ("long", "double")}

        def mutate(meta, fields):
            for f in fields:
                if f["name"] == name:
                    if (f["type"], new_type) not in allowed:
                        raise ValueError(f"widen {f['type']}→{new_type} not allowed")
                    f["type"] = new_type
                    return
            raise ValueError(f"no column {name}")

        self._evolve(mutate)

    # --------------------------------------------------------------- read

    def bucket_expr(self, key_col) -> F.Column:
        n = self.meta()["n_buckets"]
        return F.pmod(F.xxhash64(key_col), F.lit(n)).cast("int")

    def _empty(self, with_hidden: bool, meta: dict | None = None) -> DataFrame:
        """Empty DataFrame with the schema of ``meta``'s snapshot (not
        necessarily the current one — a time-travel scan that prunes to
        zero files must still surface that snapshot's columns)."""
        m = self.meta() if meta is None else meta
        fields = self._schema_fields(m)
        ddl = ", ".join(f"{f['name']} {f['type']}" for f in fields)
        if with_hidden:
            ddl += ", " + ", ".join(f"{n} {t}" for n, t in HIDDEN_FIELDS)
        return self.spark.createDataFrame([], T._parse_datatype_string(ddl))

    def _read_files(self, meta: dict, files: list[dict]) -> DataFrame:
        """Read raw rows of ``files`` resolved to ``meta``'s current schema.

        Files are grouped by the schema version they were written under;
        each group resolves to the current schema by field id (rename =
        metadata-only, widen = cast-on-read, add = null-fill). Hidden
        columns are always included."""
        cur_fields = self._schema_fields(meta)
        by_sv: dict[int, list[str]] = {}
        for f in files:
            by_sv.setdefault(f["schema_version"], []).append(os.path.join(self.path, f["path"]))
        parts = []
        for sv, paths in by_sv.items():
            old_fields = {f["id"]: f for f in self._schema_fields(meta, sv)}
            ddl = ", ".join(f"{f['name']} {f['type']}" for f in self._schema_fields(meta, sv))
            ddl += ", " + ", ".join(f"{n} {t}" for n, t in HIDDEN_FIELDS)
            df = self.spark.read.schema(T._parse_datatype_string(ddl)).parquet(*paths)
            cols = []
            for cf in cur_fields:
                of = old_fields.get(cf["id"])
                if of is None:
                    cols.append(F.lit(None).cast(cf["type"]).alias(cf["name"]))
                else:
                    c = F.col(of["name"])
                    if of["type"] != cf["type"]:
                        c = c.cast(cf["type"])
                    cols.append(c.alias(cf["name"]))
            # hidden columns null-fill like any other on legacy files (a
            # pre-_vc_seq file read under the explicit schema yields NULL
            # seq); coalesce to sentinels so winner-tuple comparisons and
            # tombstone filters stay deterministic on legacy data.
            cols += [
                F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)).alias(HIDDEN_DELETED),
                F.coalesce(F.col(HIDDEN_EPOCH), F.lit(0)).alias(HIDDEN_EPOCH),
                F.coalesce(F.col(HIDDEN_OFFSET), F.lit(0)).alias(HIDDEN_OFFSET),
                F.coalesce(F.col(HIDDEN_SEQ), F.lit(0)).alias(HIDDEN_SEQ),
            ]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    #: broadcast the merge-on-read resolve state only while the delta row
    #: count (a free upper bound on distinct delta keys, from file
    #: metadata) stays small; above it, plain joins + AQE decide.
    #: 1M rows × ~60 B narrow winner tuple ≈ 60 MB broadcast best case,
    #: but the tuple carries the key + version col, so a wide key (long
    #: URL) can reach ~250 B/row ≈ 250 MB worst case — 1M keeps the
    #: worst case inside a sane executor-memory envelope.
    AUTO_BROADCAST_DELTA_ROWS = 1_000_000

    def _resolve_mor(self, meta: dict, base_files: list[dict], delta_files: list[dict]) -> DataFrame:
        """Merge-on-read LWW resolution over base + delta files.

        Only keys present in deltas can have competing rows, so:

        1. narrow-read the delta keys (column-pruned parquet scan);
        2. narrow argmax of (version, epoch, offset, -seq) over delta rows
           ∪ the base rows sharing a delta key → one winner tuple per
           contested key (map-side combined; ~60 B/row);
        3. one pass over the full payload rows: broadcast-left-join the
           winner tuples on key and keep a row iff its key is uncontested
           or it IS the winner. Payload columns never shuffle.

        The broadcasts are size-gated on the delta row count known from
        file metadata (zero extra jobs); large backlogs fall back to
        shuffled joins, and ``compact()`` folds them away.
        """
        key, vcol = meta["key"], meta["version_col"]
        delta = self._read_files(meta, delta_files)
        small = sum(f["rows"] for f in delta_files) <= self.AUTO_BROADCAST_DELTA_ROWS
        narrow_cols = [key, vcol, HIDDEN_EPOCH, HIDDEN_OFFSET, HIDDEN_SEQ]
        cand = delta.select(*narrow_cols)
        if base_files:
            base = self._read_files(meta, base_files)
            dkeys = delta.select(key).distinct()
            if small:
                dkeys = F.broadcast(dkeys)
            cand = base.select(*narrow_cols).join(dkeys, on=key, how="left_semi").unionByName(cand)
            full = base.unionByName(delta)
        else:
            full = delta
        if meta.get("resolution", "lww") == "first_wins":
            # insert-only: earliest (epoch, offset, seq) per key wins
            ord_struct = F.struct(F.col(HIDDEN_EPOCH), F.col(HIDDEN_OFFSET), F.col(HIDDEN_SEQ))
            agg = F.min(ord_struct)
            w_cols = [
                (F.col(f"_w.{HIDDEN_EPOCH}"), "_we", F.col(HIDDEN_EPOCH)),
                (F.col(f"_w.{HIDDEN_OFFSET}"), "_wo", F.col(HIDDEN_OFFSET)),
                (F.col(f"_w.{HIDDEN_SEQ}"), "_ws", F.col(HIDDEN_SEQ)),
            ]
        else:
            # LWW; -seq in the max struct → on an exact (vcol, epoch,
            # offset) tie (unfenced re-apply of the same event) the
            # EARLIEST commit wins, preserving its derived columns.
            ord_struct = F.struct(
                F.col(vcol),
                F.col(HIDDEN_EPOCH),
                F.col(HIDDEN_OFFSET),
                (-F.col(HIDDEN_SEQ)).alias("_ns"),
            )
            agg = F.max(ord_struct)
            w_cols = [
                (F.col(f"_w.{vcol}"), "_wv", F.col(vcol)),
                (F.col(f"_w.{HIDDEN_EPOCH}"), "_we", F.col(HIDDEN_EPOCH)),
                (F.col(f"_w.{HIDDEN_OFFSET}"), "_wo", F.col(HIDDEN_OFFSET)),
                ((-F.col("_w._ns")), "_ws", F.col(HIDDEN_SEQ)),
            ]
        win = cand.groupBy(key).agg(agg.alias("_w")).select(
            F.col(key).alias("_wk"), *[src.alias(name) for src, name, _ in w_cols]
        )
        if small:
            win = F.broadcast(win)
        j = full.join(win, F.col(key) == F.col("_wk"), "left")
        cond = None
        for _, name, row_col in w_cols:
            # eqNullSafe: a NULL hidden field (legacy file formats) must
            # not NULL out the predicate and silently drop the winner.
            c = row_col.eqNullSafe(F.col(name))
            cond = c if cond is None else cond & c
        keep = F.col("_wk").isNull() | cond
        return j.filter(keep).drop("_wk", *[name for _, name, _ in w_cols])

    def _stats_columns(self) -> set[str]:
        """Columns whose min/max ride the manifest: the key and the
        version column by default (URL point lookups, time-range scans),
        plus any names in the ``stats_cols`` table property."""
        meta = self.meta()
        extra = meta.get("properties", {}).get("stats_cols", "")
        return {meta["key"], meta["version_col"]} | {c for c in extra.split(",") if c}

    @staticmethod
    def _file_out_of_range(f: dict, col: str, lo, hi) -> bool:
        """True iff the manifest PROVES no row of ``f`` has col in
        [lo, hi]. Files without recorded bounds are never pruned."""
        st = f.get("stats", {}).get(col)
        if not st:
            return False
        fmin, fmax = st
        if lo is not None and fmax < _stat_key(lo):
            return True
        if hi is not None and fmin > _stat_key(hi):
            return True
        return False

    @staticmethod
    def _prune_by_stats(files: list[dict], range_filter: dict) -> list[dict]:
        """Manifest-bounds file skipping, merge-on-read-safe.

        Output rows are always a subset of stored rows, so a bucket whose
        EVERY file is provably out of range emits nothing — whole-bucket
        pruning is unconditionally safe. Within a bucket that has NO
        delta files, each base row is final state, so per-file pruning is
        safe too. In a delta-bearing bucket, partial pruning could drop a
        row that would WIN resolution (surfacing a stale competitor whose
        value passes the filter), so those buckets keep all their files
        and rely on the row-level filter.
        """
        by_bucket: dict[int, list[dict]] = {}
        for f in files:
            by_bucket.setdefault(f["bucket"], []).append(f)
        kept: list[dict] = []
        for fs in by_bucket.values():
            out = [
                f
                for f in fs
                if not any(
                    LakeTable._file_out_of_range(f, c, lo, hi)
                    for c, (lo, hi) in range_filter.items()
                )
            ]
            if not out:
                continue  # whole bucket proven out of range
            has_delta = any(f.get("kind", "base") != "base" for f in fs)
            kept.extend(fs if has_delta else out)
        return kept

    def scan(
        self,
        buckets: set[int] | None = None,
        with_hidden: bool = False,
        version: int | None = None,
        range_filter: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """LWW-resolved rows of snapshot ``version`` (default: current);
        ``buckets`` prunes data files by key-bucket. Time travel = reading
        an older snapshot's file list (files are immutable; old snapshots
        stay readable until :meth:`expire_snapshots` removes them).

        ``range_filter``: ``{col: (lo, hi)}`` conjunctive bounds (either
        side ``None`` for open). Applied BOTH as manifest-stats file
        skipping (files whose footer bounds prove no match never reach
        the Spark plan — at 100 TB a one-day ``warc_ts`` slice plans only
        that day's files) and as a row filter on the result.
        """
        meta = self.meta(version)
        files = meta["files"]
        if buckets is not None:
            files = [f for f in files if f["bucket"] in buckets]
        if range_filter:
            files = self._prune_by_stats(files, range_filter)
        if not files:
            out = self._empty(with_hidden, meta)
        else:
            base_files = [f for f in files if f.get("kind", "base") == "base"]
            delta_files = [f for f in files if f.get("kind", "base") != "base"]
            if delta_files:
                out = self._resolve_mor(meta, base_files, delta_files)
            else:
                out = self._read_files(meta, base_files)
        if not with_hidden and files:
            out = out.filter(~F.col(HIDDEN_DELETED)).drop(*[n for n, _ in HIDDEN_FIELDS])
        if range_filter:
            for c, (lo, hi) in range_filter.items():
                if lo is not None:
                    out = out.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    out = out.filter(F.col(c) <= F.lit(hi))
        return out

    def read(self) -> DataFrame:
        return self.scan()

    # -------------------------------------------------------------- write

    def _write_data(
        self,
        df: DataFrame,
        schema_version: int,
        kind: str = "base",
        writer_opts: dict[str, str] | None = None,
    ) -> list[dict]:
        """Write rows partitioned by `_b` (bucket); returns file entries."""
        commit_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.path, DATA_DIR, f"c-{commit_id}")
        w = df.write
        for k, v in (writer_opts or {}).items():
            w = w.option(k, v)
        (w.partitionBy("_b").mode("error").parquet(out_dir))
        todo = []
        for bdir in sorted(os.listdir(out_dir)):
            if not bdir.startswith("_b="):
                continue
            bucket = int(bdir.split("=")[1])
            for fn in sorted(os.listdir(os.path.join(out_dir, bdir))):
                if fn.endswith(".parquet"):
                    todo.append((bucket, os.path.join(out_dir, bdir, fn)))

        stat_cols = self._stats_columns()

        def entry(item):
            bucket, full = item
            md = pq.read_metadata(full)
            return {
                "path": os.path.relpath(full, self.path),
                "bucket": bucket,
                "schema_version": schema_version,
                "rows": md.num_rows,
                "kind": kind,
                "stats": _footer_stats(md, stat_cols),
            }

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as ex:
            return list(ex.map(entry, todo))

    def _commit_files(
        self,
        base_meta: dict,
        new_files: list[dict],
        replaced_buckets: set[int],
        properties: dict[str, str] | None = None,
        lineage: dict | None = None,
    ) -> dict:
        meta = json.loads(json.dumps(base_meta))
        kept = [f for f in meta["files"] if f["bucket"] not in replaced_buckets]
        meta["files"] = kept + new_files
        meta["parent"] = base_meta["version"]
        meta["version"] = base_meta["version"] + 1
        if properties:
            meta["properties"].update(properties)
        self._publish(meta, meta["version"])
        if lineage is not None:
            lineage = dict(lineage, snapshot_id=meta["version"])
            lp = os.path.join(self.path, LINEAGE_DIR, f"commit-{meta['version']:08d}.json")
            with open(lp + ".tmp", "w") as f:
                json.dump(lineage, f)
            os.rename(lp + ".tmp", lp)
        self._meta_cache = None
        return meta

    def lineage_records(self) -> list[dict]:
        d = os.path.join(self.path, LINEAGE_DIR)
        out = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out.append(json.load(f))
        return out

    # -------------------------------------------------------------- merge

    def merge(
        self,
        batch: DataFrame,
        fence: tuple[str, int] | None = None,
        extra_lineage: dict | None = None,
        salt_buckets: int = 0,
        post_merge=None,
        broadcast_winners: bool | str = "auto",
    ) -> dict | None:
        """LWW MERGE of a CDC batch into the table (merge-on-read).

        Commits only the batch's own in-batch LWW winners as per-bucket
        **delta files** — the existing table is neither read nor rewritten,
        so merge cost is O(batch) regardless of table size. Readers resolve
        LWW over base+deltas (:meth:`scan`); :meth:`compact` folds deltas
        into base lazily. The whole merge is ONE Spark job (the write; the
        winner broadcast build is a stage of it) — merge stats ride along
        via ``DataFrame.observe`` instead of a separate aggregation job.

        ``batch`` columns: the table's user columns (missing → null-filled,
        supporting in-flight schema evolution) plus ``op`` ('I'/'U'/'D'),
        ``epoch``, ``offset``. Rows with NULL key or NULL version column are
        discarded (reference discard-filter semantics, core.py:1580-1593).

        ``fence=(stream_id, batch_id)``: idempotency guard — if this fence
        id is already committed the merge is a no-op returning None.

        ``salt_buckets>0`` routes the in-batch LWW dedup through an explicit
        two-level salted aggregation (hot-key protection); 0 uses a single
        narrow argmax (map-side partial aggregation handles moderate skew).

        ``broadcast_winners``: join-strategy size gate for the winner
        keyset (see :func:`pipeline_spark.operators.lww.lww_latest_semi`).
        ``"auto"`` (default — safe for any batch size) counts the winner
        set once and broadcasts only when it fits; callers with a KNOWN
        bound (e.g. ``maxFilesPerTrigger``-capped micro-batches) pass
        ``True`` to skip the count job, and a 10^10-key backfill through
        the default never funnels the keyset through the driver.

        NOTE: ``batch`` is evaluated TWICE — a full-payload probe branch
        (the write) and a column-pruned narrow branch (the winner argmax).
        Cheap when ``batch`` is file-backed (the narrow pass prunes to ~4
        columns at the scan); an expensive in-memory/computed batch should
        be persisted or checkpointed by the caller first, or its transform
        moved into ``post_merge`` so it runs once on winners only.

        ``post_merge``: optional DataFrame→DataFrame transform applied to
        the winning rows just before the write — the hook for derived
        columns that only need computing on *winning* rows (e.g. HTML→text
        extraction runs on the post-LWW survivors, not on every event;
        at high duplicate/update rates this cuts UDF work by orders of
        magnitude). Must preserve the table schema. It runs AFTER the
        bucket repartition, so the expensive UDF output streams straight
        into the parquet encoder and never crosses a shuffle.
        """
        from pyspark.sql import Observation

        from pipeline_spark.operators.lww import AUTO_BROADCAST_MAX_WINNERS, narrow_winners

        meta = self.meta()
        if fence is not None:
            last = self.fence_value(fence[0])
            if last is not None and fence[1] <= last:
                return None  # already applied — exactly-once replay skip

        key = meta["key"]
        vcol = meta["version_col"]
        seq = meta["version"] + 1  # commit sequence for exact-tie resolution
        cur_fields = self._schema_fields(meta)
        batch_cols = set(batch.columns)
        valid = F.col(key).isNotNull() & F.col(vcol).isNotNull()

        # Merge stats are observed on the PROBE branch only (the build
        # branch below re-reads `batch` without the CollectMetrics node, so
        # nothing double-counts), and materialize with the write job.
        obs = Observation()
        observed = batch.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.when(F.col(key).isNull() | F.col(vcol).isNull(), 1).otherwise(0)).alias("rows_discarded"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("rows_delete_events"),
            F.min("offset").alias("start_offset"),
            F.max("offset").alias("end_offset"),
        )

        # Tombstones carry NO payload: a delete row only needs (key, vcol,
        # hidden cols) to win LWW and mark the key deleted — nulling every
        # other user column cuts the bytes shuffled + written per delete
        # from multi-KB (html) to ~tens of bytes. scan() never surfaces
        # tombstone payloads anyway (deleted rows are filtered / only the
        # delete fact is visible through changes()).
        is_delete = F.col("op") == F.lit("D")
        proj = []
        for f in cur_fields:
            if f["name"] not in batch_cols:
                proj.append(F.lit(None).cast(f["type"]).alias(f["name"]))
            elif f["name"] in (key, vcol):
                proj.append(F.col(f["name"]).cast(f["type"]).alias(f["name"]))
            else:
                proj.append(
                    F.when(is_delete, F.lit(None)).otherwise(F.col(f["name"])).cast(f["type"]).alias(f["name"])
                )
        proj += [
            (F.col("op") == F.lit("D")).alias(HIDDEN_DELETED),
            F.col("epoch").cast("long").alias(HIDDEN_EPOCH),
            F.col("offset").cast("long").alias(HIDDEN_OFFSET),
            F.lit(seq).cast("long").alias(HIDDEN_SEQ),
        ]
        src = observed.filter(valid).select(*proj)

        # In-batch LWW winner per key via NARROW argmax + semi-join-back:
        #   * the aggregation sees only (key, version, epoch, offset) —
        #     ~60 B/row. An aggregation over the full row would be
        #     catastrophic: max_by with a multi-KB payload struct makes
        #     Spark's ObjectHashAggregate fall back to SORT-BASED
        #     aggregation (fallback threshold 128 keys/partition), i.e. an
        #     external sort of the html payloads — measured 10-30× slower;
        #   * the multi-KB payload is then filtered in place by the
        #     (size-gated broadcast) semi-join — never shuffled or sorted.
        # Sound because (epoch, offset) is the stream's total order →
        # (key, version, epoch, offset) is unique per row within a stream.
        first_wins = meta.get("resolution", "lww") == "first_wins"
        order_cols = [HIDDEN_EPOCH, HIDDEN_OFFSET] if first_wins else [vcol, HIDDEN_EPOCH, HIDDEN_OFFSET]
        types = {f["name"]: f["type"] for f in cur_fields}
        narrow_src = batch.filter(valid).select(
            F.col(key).cast(types[key]).alias(key),
            F.col(vcol).cast(types[vcol]).alias(vcol),
            F.col("epoch").cast("long").alias(HIDDEN_EPOCH),
            F.col("offset").cast("long").alias(HIDDEN_OFFSET),
        )
        win = narrow_winners(
            narrow_src, [key], order_cols, salt_buckets=salt_buckets, keep="min" if first_wins else "max"
        )
        if broadcast_winners == "auto":
            win = win.localCheckpoint(eager=True)
            do_broadcast = win.count() <= AUTO_BROADCAST_MAX_WINNERS
        else:
            do_broadcast = bool(broadcast_winners)
        if do_broadcast:
            win = F.broadcast(win)
        merged = src.join(win, on=[key, *order_cols], how="left_semi")

        # bucket-route BEFORE the derived-column hook: the shuffle moves
        # only raw batch winners (html, no text), and the expensive UDF
        # runs inside the write stage at n_buckets-task parallelism.
        merged = merged.withColumn("_b", self.bucket_expr(F.col(key)))
        merged = merged.repartition(meta["n_buckets"], F.col("_b"))
        if post_merge is not None:
            merged = post_merge(merged)

        new_files = self._write_data(merged, meta["schema_version"], kind="delta")
        try:
            stats = obs.get
        except Exception:
            # Degenerate plans (e.g. a zero-file source relation) can be
            # constant-folded so the CollectMetrics node never materializes.
            # Fall back to one explicit narrow aggregation job.
            stats = batch.agg(
                F.count(F.lit(1)).alias("rows_in"),
                F.sum(F.when(F.col(key).isNull() | F.col(vcol).isNull(), 1).otherwise(0)).alias("rows_discarded"),
                F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("rows_delete_events"),
                F.min("offset").alias("start_offset"),
                F.max("offset").alias("end_offset"),
            ).collect()[0]
        touched = {f["bucket"] for f in new_files}

        props = {f"fence.{fence[0]}": str(fence[1])} if fence else None
        rows_written = sum(f["rows"] for f in new_files)
        lin = self._lineage_dict(stats, rows_written, len(touched), extra_lineage)
        # per-PARTITION lineage (north-rule contract): rows written per
        # key-bucket this commit — already known from the file manifest,
        # so recording it costs no extra job. Bounded by n_buckets.
        bucket_rows: dict[str, int] = {}
        for f in new_files:
            b = str(f["bucket"])
            bucket_rows[b] = bucket_rows.get(b, 0) + f["rows"]
        lin["bucket_rows"] = bucket_rows
        try:
            self._commit_files(meta, new_files, set(), properties=props, lineage=lin)
        except CommitConflict:
            # concurrent writer won; clean up our orphaned files and re-raise
            for f in new_files:
                os.unlink(os.path.join(self.path, f["path"]))
            raise
        return lin

    @staticmethod
    def _lineage_dict(stats_row, rows_written: int, buckets_touched: int, extra: dict | None) -> dict:
        lin = {
            "rows_in": stats_row["rows_in"],
            "rows_discarded": int(stats_row["rows_discarded"] or 0),
            "rows_delete_events": int(stats_row["rows_delete_events"] or 0),
            "start_offset": stats_row["start_offset"],
            "end_offset": stats_row["end_offset"],
            "rows_written": rows_written,
            "buckets_touched": buckets_touched,
        }
        if extra:
            lin.update(extra)
        return lin

    # --------------------------------------------------------- maintenance

    def changes(self, since_version: int, until_version: int | None = None) -> DataFrame:
        """Row-level changes between two snapshots — the incremental-read /
        change-propagation API (analog of the reference's watermark scan
        ``clickhouse_feeder.py:56-107`` and NOTIFY-driven detector feed
        ``detector.py:908-922``, without a bus).

        Returns the rows whose (key, version, epoch, offset) tuple exists
        at ``until`` but not at ``since``, with ``_change_type`` =
        'upsert' | 'delete' (tombstones are retained by the merge, so
        deletions surface here as 'delete' rows). Only buckets whose file
        sets differ between the snapshots are read — incremental cost is
        O(changed buckets), not O(table).
        """
        until = self.current_version() if until_version is None else until_version
        old_meta, new_meta = self.meta(since_version), self.meta(until)
        if old_meta["n_buckets"] != new_meta["n_buckets"]:
            # a rebucket() happened in the window: bucket ids in the two
            # snapshots live in DIFFERENT hash spaces, so bucket pruning
            # would compare apples to oranges (a shrink would silently
            # drop old buckets >= new n_buckets from the before-side and
            # re-emit their unchanged rows as phantom upserts). Read both
            # snapshots unpruned; the anti-join still yields exact changes.
            changed_buckets = old_buckets = None
        else:
            old_files = {b: set() for b in range(new_meta["n_buckets"])}
            for f in old_meta["files"]:
                old_files.setdefault(f["bucket"], set()).add(f["path"])
            changed_buckets = set()
            for f in new_meta["files"]:
                if f["path"] not in old_files.get(f["bucket"], set()):
                    changed_buckets.add(f["bucket"])
            old_buckets = changed_buckets
        key = new_meta["key"]
        vcol = new_meta["version_col"]
        join_cols = [key, vcol, HIDDEN_EPOCH, HIDDEN_OFFSET]
        new = self.scan(buckets=changed_buckets, with_hidden=True, version=until)
        old = self.scan(buckets=old_buckets, with_hidden=True, version=since_version).select(*join_cols)
        delta = new.join(old, on=join_cols, how="left_anti")
        return delta.withColumn(
            "_change_type", F.when(F.col(HIDDEN_DELETED), F.lit("delete")).otherwise(F.lit("upsert"))
        ).drop(HIDDEN_DELETED, HIDDEN_EPOCH, HIDDEN_OFFSET, HIDDEN_SEQ)

    def remove_orphan_files(self, older_than_s: float = 3 * 24 * 3600) -> dict:
        """Delete data files no snapshot references (Iceberg
        ``remove_orphan_files`` analog).

        Orphans arise when a writer crashes between ``_write_data`` and
        the snapshot commit, or loses the optimistic-commit race and never
        retries — the files exist on disk but in no manifest, so neither
        scans nor :meth:`expire_snapshots` (which only walks manifests)
        will ever touch them; at 10^10 keys with restarts they accumulate
        without bound. Safety: only files older than ``older_than_s`` are
        deleted, so a commit IN FLIGHT right now (files written, manifest
        publish microseconds away) can never lose its data — the same
        grace-period contract as Iceberg's.
        """
        import time as _time

        referenced: set[str] = set()
        for n in os.listdir(os.path.join(self.path, META_DIR)):
            if n.startswith("v") and n.endswith(".json"):
                referenced |= {f["path"] for f in self.meta(int(n[1:9]))["files"]}
        cutoff = _time.time() - older_than_s
        removed = 0
        data_root = os.path.join(self.path, DATA_DIR)
        for dirpath, _, names in os.walk(data_root):
            for fn in names:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.path)
                if rel not in referenced and os.path.getmtime(full) < cutoff:
                    os.unlink(full)
                    removed += 1
        for sub in list(os.walk(data_root, topdown=False)):
            if not sub[1] and not sub[2] and sub[0] != data_root:
                os.rmdir(sub[0])
        return {"orphans_removed": removed}

    def verify_integrity(self, check_footers: bool = True) -> dict:
        """Table fsck: the current snapshot's manifest must agree with the
        filesystem and the parquet footers.

        Checks, per referenced file: (1) it exists on disk, (2) its footer
        row count equals the manifest's ``rows`` (a mismatch means the
        manifest lies to the planner — scans and stats-pruning decisions
        become untrustworthy). Also reports unreferenced data files
        (candidates for :meth:`remove_orphan_files`, informational —
        in-flight writers legitimately create them). Metadata-only reads
        plus one footer open per file (no Spark job); run it like
        Iceberg's metadata audits, after restores/crashes or before
        destructive maintenance. Returns a report dict; raises
        ``TableCorruption`` listing every violation if any hard check
        fails.
        """
        import pyarrow.parquet as _pq

        meta = self.meta()
        missing: list[str] = []
        row_mismatch: list[str] = []
        for f in meta["files"]:
            full = os.path.join(self.path, f["path"])
            if not os.path.exists(full):
                missing.append(f["path"])
                continue
            if check_footers:
                n = _pq.ParquetFile(full).metadata.num_rows
                if n != f["rows"]:
                    row_mismatch.append(f"{f['path']}: footer={n} manifest={f['rows']}")
        referenced = {os.path.normpath(f["path"]) for f in meta["files"]}
        unreferenced = 0
        data_root = os.path.join(self.path, DATA_DIR)
        for dirpath, _, names in os.walk(data_root):
            for fn in names:
                if fn.endswith(".parquet"):
                    rel = os.path.normpath(os.path.relpath(os.path.join(dirpath, fn), self.path))
                    if rel not in referenced:
                        unreferenced += 1
        report = {
            "version": meta["version"],
            "files_checked": len(meta["files"]),
            "missing_files": missing,
            "row_count_mismatches": row_mismatch,
            "unreferenced_files": unreferenced,
        }
        if missing or row_mismatch:
            raise TableCorruption(str(report))
        return report

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Delete metadata of all but the newest ``keep_last`` snapshots and
        any data file no retained snapshot references (Iceberg
        ``expire_snapshots`` analog). Time travel to expired versions stops
        working; the current snapshot is never touched."""
        cur = self.current_version()
        all_versions = sorted(
            int(n[1:9]) for n in os.listdir(os.path.join(self.path, META_DIR)) if n.startswith("v") and n.endswith(".json")
        )
        # intersect with versions actually present — a prior expire with a
        # smaller keep_last may already have removed part of the window
        keep_versions = set(range(max(0, cur - keep_last + 1), cur + 1)) & set(all_versions)
        referenced: set[str] = set()
        for v in keep_versions:
            referenced |= {f["path"] for f in self.meta(v)["files"]}
        removed_files = 0
        for v in all_versions:
            if v in keep_versions:
                continue
            for f in self.meta(v)["files"]:
                full = os.path.join(self.path, f["path"])
                if f["path"] not in referenced and os.path.exists(full):
                    os.unlink(full)
                    removed_files += 1
            os.unlink(self._meta_path(v))
        # empty commit dirs left behind are harmless; sweep them anyway
        data_root = os.path.join(self.path, DATA_DIR)
        for d in os.listdir(data_root):
            for sub in list(os.walk(os.path.join(data_root, d), topdown=False)):
                if not sub[1] and not sub[2]:
                    os.rmdir(sub[0])
        return {"snapshots_removed": len(all_versions) - len(keep_versions & set(all_versions)), "files_removed": removed_files}

    def rebucket(self, new_n_buckets: int) -> dict:
        """Change the key-hash bucket count (partition-spec evolution).

        At 10^10 keys the create-time ``n_buckets`` eventually makes each
        bucket too large for efficient merge-on-read resolution and
        compaction; growing it must not require a new table. The bucket id
        is DERIVED from the key (never stored per row), so re-bucketing is
        one resolved read + one bucketed rewrite committed atomically —
        concurrent readers keep their old snapshot, the next reader sees
        the new layout. Old snapshots remain time-travelable because each
        file entry carries its own bucket id (pruning on an old snapshot
        keys off the CURRENT n_buckets, so time-travel scans of
        pre-rebucket snapshots should pass ``buckets=None``).
        """
        assert new_n_buckets >= 1
        meta = self.meta()
        if new_n_buckets == meta["n_buckets"]:
            return {"n_buckets": new_n_buckets, "rewritten": 0}
        df = self.scan(with_hidden=True).withColumn(
            "_b", F.pmod(F.xxhash64(F.col(meta["key"])), F.lit(new_n_buckets)).cast("int")
        )
        df = df.repartition(min(new_n_buckets, 256), F.col("_b"))
        new_files = self._write_data(df, meta["schema_version"], kind="base")
        new_meta = json.loads(json.dumps(meta))
        new_meta["n_buckets"] = new_n_buckets
        new_meta["files"] = new_files
        new_meta["parent"] = meta["version"]
        new_meta["version"] = meta["version"] + 1
        self._publish(new_meta, new_meta["version"])
        lin = {"action": "rebucket", "n_buckets": new_n_buckets, "snapshot_id": new_meta["version"]}
        lp = os.path.join(self.path, LINEAGE_DIR, f"commit-{new_meta['version']:08d}.json")
        with open(lp + ".tmp", "w") as f:
            json.dump(lin, f)
        os.rename(lp + ".tmp", lp)
        return {"n_buckets": new_n_buckets, "rewritten": len(new_files)}

    def compact(
        self,
        target_files_per_bucket: int = 1,
        purge_tombstones_before_epoch: int | None = None,
        sort_by: str | None = None,
        rows_per_file: int | None = None,
    ) -> dict | None:
        """Fold delta files into base and rewrite fragmented buckets
        (small-file compaction — Iceberg ``rewrite_data_files`` analog,
        the background merge of ReplacingMergeTree, ``db.py:82-84``).

        Victims = every bucket holding a delta file, plus buckets with more
        than ``target_files_per_bucket`` base files. Each victim bucket is
        LWW-resolved and rewritten as a single base file; subsequent scans
        of the bucket skip merge-on-read resolution entirely. Maintenance
        only — never on the ingest critical path.

        Tombstone GC: by default tombstones are RETAINED — they are what
        stops a late/duplicate merge of an older event from resurrecting a
        deleted key. At 10^10 keys with churn that grows the base without
        bound, so ``purge_tombstones_before_epoch=E`` drops tombstones with
        ``_vc_epoch <= E`` during the rewrite. The caller's contract: every
        write stream's fence must already be past epoch ``E`` (fenced
        replays of epochs <= E are skipped before any merge work, so no
        event old enough to be outraced by a purged tombstone can ever be
        applied again). Tombstones in non-victim buckets purge on a later
        compaction — GC is lazy, like the rest of this path. Time travel to
        snapshots older than the compaction still resolves deletes
        correctly (old snapshots read the old files).

        Sort-order compaction (Iceberg table sort-order analog):
        ``sort_by`` sorts each rewritten bucket on a column and
        ``rows_per_file`` splits the sorted run into multiple files — each
        file then covers a TIGHT, near-disjoint range of the sort column,
        which is what makes manifest-stats file skipping
        (``scan(range_filter=...)``) effective: key-hash bucketing
        deliberately destroys value locality, so without a sort order a
        compacted bucket file spans the whole value range and no range
        predicate can ever prune it. Sort by the version/time column to
        make time-slice scans at 100 TB plan only the matching files."""
        meta = self.meta()
        base_count: dict[int, int] = {}
        victims: set[int] = set()
        for f in meta["files"]:
            if f.get("kind", "base") == "base":
                base_count[f["bucket"]] = base_count.get(f["bucket"], 0) + 1
            else:
                victims.add(f["bucket"])
        victims |= {b for b, n in base_count.items() if n > target_files_per_bucket}
        if not victims:
            return None
        df = self.scan(buckets=victims, with_hidden=True)
        if purge_tombstones_before_epoch is not None:
            df = df.filter(
                ~(F.col(HIDDEN_DELETED) & (F.col(HIDDEN_EPOCH) <= F.lit(purge_tombstones_before_epoch)))
            )
        df = df.withColumn("_b", self.bucket_expr(F.col(meta["key"])))
        df = df.repartition(len(victims), F.col("_b"))
        writer_opts = {}
        if sort_by is not None:
            # contiguous sorted runs + maxRecordsPerFile splits => each
            # output file holds one tight slice of the sort column
            df = df.sortWithinPartitions("_b", sort_by)
            if rows_per_file is not None:
                writer_opts["maxRecordsPerFile"] = str(rows_per_file)
        new_files = self._write_data(df, meta["schema_version"], kind="base", writer_opts=writer_opts)
        self._commit_files(meta, new_files, victims, lineage={"action": "compact", "buckets": len(victims)})
        return {"buckets_compacted": len(victims)}
