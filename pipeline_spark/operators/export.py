"""Deterministic bundled export (K4) — content-hash-named output bundles.

The reference reprocessor exports measurements as size-cut bundle files
whose contents must be reproducible run-over-run (deterministic ordering
discipline ``af/fastpath/fastpath/reprocessor.py:200-344,396-399``).
Spark-native form:

* bundle assignment is a **data-independent hash cut**
  (``pmod(xxhash64(sort key), n_bundles)``) — NOT ``repartitionByRange``,
  whose sampled boundaries are not stable across runs/sessions;
* rows sort within each bundle on the caller's sort columns (total order
  required for byte-identity — pass a unique tie-break);
* each bundle serializes to JSON lines (``to_json`` of the row struct) and
  is renamed to ``bundle-<sha256[:16]>.jsonl`` — identical input ⇒
  identical names ⇒ a re-export is trivially diffable/idempotent;
* a manifest (bundle name, rows, sha256) is written sorted, itself
  deterministic.

Everything before the final rename is one distributed write; the renames
and hashing are O(n_bundles) driver-side file ops.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import shutil

from pyspark.sql import DataFrame, functions as F


def export_bundles(
    df: DataFrame,
    out_dir: str,
    sort_cols: list[str],
    rows_per_bundle: int = 100_000,
    n_bundles: int | None = None,
    row_count_hint: int | None = None,
) -> dict:
    """Export ``df`` as deterministic content-hash-named jsonl bundles.

    ``sort_cols`` must totally order the rows (include a unique id).
    Returns the manifest dict (also written to ``out_dir/manifest.json``).

    Bundle count: pass ``n_bundles`` directly, or ``row_count_hint`` when
    the cardinality is already known (e.g. from merge lineage
    ``rows_written`` totals) — otherwise sizing falls back to one extra
    ``count()`` scan of ``df``, a full second pass at 100 TB.
    """
    if n_bundles is None:
        n = row_count_hint if row_count_hint is not None else df.count()
        n_bundles = max(1, math.ceil(n / rows_per_bundle))
    bundle = F.pmod(F.xxhash64(*[F.col(c) for c in sort_cols]), F.lit(n_bundles)).cast("int")
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    staged = os.path.join(out_dir, "_staging")
    shutil.rmtree(staged, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    (
        df.withColumn("_bundle", bundle)
        .repartition(n_bundles, F.col("_bundle"))
        .sortWithinPartitions("_bundle", *sort_cols)
        .select(F.col("_bundle"), line.alias("value"))
        .write.partitionBy("_bundle")
        .mode("overwrite")
        .text(staged)
    )
    bundles = []
    for bdir in sorted(d for d in os.listdir(staged) if d.startswith("_bundle=")):
        idx = int(bdir.split("=")[1])
        parts = sorted(
            fn for fn in os.listdir(os.path.join(staged, bdir)) if not fn.startswith(("_", "."))
        )
        content = b"".join(open(os.path.join(staged, bdir, p), "rb").read() for p in parts)
        sha = hashlib.sha256(content).hexdigest()
        name = f"bundle-{sha[:16]}.jsonl"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(content)
        bundles.append({"bundle": idx, "name": name, "sha256": sha, "rows": content.count(b"\n")})
    shutil.rmtree(staged)
    manifest = {"n_bundles": n_bundles, "sort_cols": sort_cols, "bundles": bundles}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
