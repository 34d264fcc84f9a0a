"""Command-line surface: ``python -m pipeline_spark <command>``.

The reference ships its pipeline as operable commands — the fastpath
daemon/batch entry (``af/fastpath/fastpath/core.py:1674-1683``, flag
parsing at ``core.py:1093-1147``), the detector service
(``af/detector/detector/detector.py:868-922``) and maintenance scripts
(``af/analysis/ooni_db_backup.py``). A user switching from the reference
operates jobs, not a Python API, so the engine exposes the same verbs as
a thin veneer over the library: every command builds the declarative
plan through the public API and prints ONE JSON line with the result
(counters, paths, versions) — machine-readable like bench.py's output.

No logic lives here: argument parsing and JSON printing only. Anything a
command can do, the library API can do identically (tests drive both).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args, app: str):
    from pipeline_spark.session import get_spark, parse_extra_conf

    extra = {}
    for spec in getattr(args, "conf", None) or []:
        extra.update(parse_extra_conf(spec))
    return get_spark(
        f"cli_{app}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        extra_conf=extra or None,
    )


def _table(spark, path: str):
    from pipeline_spark.lake import LakeTable

    return LakeTable(spark, path)


def _parse_schema(spec: str) -> list[tuple[str, str]]:
    """``url:string,warc_ts:timestamp,html:binary`` → [(name, ddl), ...].

    Splits on top-level commas only, so parameterized DDL types —
    ``decimal(10,2)``, ``map<string,int>``, ``struct<a:int,b:string>`` —
    pass through to Spark intact."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(spec + ","):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            part = spec[start:i].strip()
            start = i + 1
            if not part:
                continue
            name, _, typ = part.partition(":")
            if not name.strip() or not typ.strip():
                raise SystemExit(f"bad --schema entry {part!r}; want name:type")
            out.append((name.strip(), typ.strip()))
    if not out:
        raise SystemExit(f"bad --schema {spec!r}; want name:type,...")
    return out


def _parquet_footer_rows(out_dir: str) -> int | None:
    """Row count of a just-written local parquet dir from footer metadata
    only — saves the second full scan a count job would run."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    if not files:
        return None
    try:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def cmd_create(args) -> dict:
    from pipeline_spark.lake import LakeTable

    spark = _spark(args, "create")
    t = LakeTable.create(
        spark,
        args.table,
        _parse_schema(args.schema),
        key=args.key,
        version_col=args.version_col,
        n_buckets=args.n_buckets,
        overwrite=args.overwrite,
        resolution=args.resolution,
    )
    return {"table": args.table, "version": t.current_version(), "n_buckets": args.n_buckets}


def cmd_replay(args) -> dict:
    from pipeline_spark.streaming import replay_stream

    spark = _spark(args, "replay")
    t = _table(spark, args.table)
    kwargs = {}
    if args.schema:
        # custom-schema tables need the stream read with THEIR columns —
        # the default CDC DDL would surface the key/version as NULL and
        # merge's discard filter would silently drop every row
        kwargs["schema_ddl"] = ", ".join(f"{n} {typ}" for n, typ in _parse_schema(args.schema))
    counters = replay_stream(
        spark,
        args.stream,
        t,
        checkpoint=args.checkpoint,
        max_files_per_trigger=args.max_files,
        extract=args.extract,
        salt_buckets=args.salt_buckets,
        compact_every=args.compact_every,
        **kwargs,
    )
    return {"table": args.table, "version": t.current_version(), **counters}


def cmd_compact(args) -> dict:
    spark = _spark(args, "compact")
    t = _table(spark, args.table)
    stats = t.compact(
        target_files_per_bucket=args.target_files_per_bucket,
        purge_tombstones_before_epoch=args.purge_tombstones_before_epoch,
        sort_by=args.sort_by,
        rows_per_file=args.rows_per_file,
    )
    return {"table": args.table, "version": t.current_version(), "compacted": stats or {}}


def cmd_fsck(args) -> dict:
    spark = _spark(args, "fsck")
    return _table(spark, args.table).verify_integrity(check_footers=not args.no_footers)


def cmd_expire(args) -> dict:
    spark = _spark(args, "expire")
    return _table(spark, args.table).expire_snapshots(keep_last=args.keep)


def cmd_rebucket(args) -> dict:
    spark = _spark(args, "rebucket")
    return _table(spark, args.table).rebucket(args.n_buckets)


def cmd_backup(args) -> dict:
    from pipeline_spark.lake.backup import backup_table

    spark = _spark(args, "backup")
    return backup_table(_table(spark, args.table), args.dest)


def cmd_restore(args) -> dict:
    from pipeline_spark.lake.backup import restore_table

    spark = _spark(args, "restore")
    t = restore_table(spark, args.backup, args.dest, version=args.version)
    return {"table": args.dest, "version": t.current_version(), "rows": t.read().count()}


def cmd_changes(args) -> dict:
    spark = _spark(args, "changes")
    t = _table(spark, args.table)
    df = t.changes(args.since, until_version=args.until)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        rows = _parquet_footer_rows(args.out)
        if rows is None:  # non-local / unreadable footers: fall back to a scan
            rows = spark.read.parquet(args.out).count()
        return {"table": args.table, "since": args.since, "out": args.out, "rows": rows}
    return {"table": args.table, "since": args.since, "rows": df.count()}


def cmd_feeds(args) -> dict:
    """Detector + RSS publish over the table changelog: the CLI analog of
    the reference detector's feed rendering (detector.py:627-634)."""
    from pyspark.sql import functions as F

    from pipeline_spark.operators.detector import detect_changes_batch
    from pipeline_spark.operators.feeds import publish_change_feeds

    spark = _spark(args, "feeds")
    t = _table(spark, args.table)
    df = t.changes(args.since).withColumn("_value", F.expr(args.value_expr))
    keys = [k.strip() for k in args.keys.split(",")]
    flips = detect_changes_batch(df, keys, ts_col=args.ts_col, value_col="_value", tiebreak_col=args.tiebreak_col)
    written = publish_change_feeds(
        flips,
        args.out,
        key_col=keys[0],
        ts_col=args.ts_col,
        group_col=args.group_col,
        max_items=args.max_items,
    )
    return {"table": args.table, "since": args.since, "feeds": written}


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="python -m pipeline_spark", description=__doc__.splitlines()[0])
    ap.add_argument("--master", default=None, help="Spark master (default: spark-submit's, or local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument(
        "--conf",
        action="append",
        default=None,
        metavar="K=V[;K2=V2]",
        help="extra Spark conf, repeatable (spark-submit parity); e.g. "
        "--conf spark.sql.execution.python.udf.buffer.size=2097152 for "
        "map-only transform jobs (see README slot-sizing guidance)",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("create", help="create an empty lake table")
    p.add_argument("--table", required=True)
    p.add_argument("--schema", required=True, help="name:type,... (Spark DDL types)")
    p.add_argument("--key", default="url")
    p.add_argument("--version-col", default="warc_ts")
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--resolution", choices=["lww", "first_wins"], default="lww")
    p.add_argument("--overwrite", action="store_true")
    p.set_defaults(fn=cmd_create)

    p = sub.add_parser("replay", help="apply a CDC change-file stream (exactly-once, epoch-fenced)")
    p.add_argument("--stream", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--max-files", type=int, default=None, help="maxFilesPerTrigger (micro-batch size)")
    p.add_argument("--extract", choices=["winners", "eager", "none"], default="winners")
    p.add_argument(
        "--schema", default=None,
        help="name:type,... of the change stream incl. the op/epoch/offset envelope (default: the built-in CDC schema)",
    )
    p.add_argument("--salt-buckets", type=int, default=0)
    p.add_argument("--compact-every", type=int, default=0)
    p.set_defaults(fn=cmd_replay)

    p = sub.add_parser("compact", help="fold merge-on-read deltas, rewrite fragmented buckets")
    p.add_argument("--table", required=True)
    p.add_argument("--target-files-per-bucket", type=int, default=1)
    p.add_argument("--purge-tombstones-before-epoch", type=int, default=None)
    p.add_argument("--sort-by", default=None)
    p.add_argument("--rows-per-file", type=int, default=None)
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("fsck", help="verify snapshot/file integrity")
    p.add_argument("--table", required=True)
    p.add_argument("--no-footers", action="store_true", help="skip parquet footer checks")
    p.set_defaults(fn=cmd_fsck)

    p = sub.add_parser("expire", help="expire old snapshots")
    p.add_argument("--table", required=True)
    p.add_argument("--keep", type=int, default=1)
    p.set_defaults(fn=cmd_expire)

    p = sub.add_parser("rebucket", help="change the table's bucket count")
    p.add_argument("--table", required=True)
    p.add_argument("--n-buckets", type=int, required=True)
    p.set_defaults(fn=cmd_rebucket)

    p = sub.add_parser("backup", help="base+incremental snapshot backup")
    p.add_argument("--table", required=True)
    p.add_argument("--dest", required=True)
    p.set_defaults(fn=cmd_backup)

    p = sub.add_parser("restore", help="materialize a backed-up snapshot as a table")
    p.add_argument("--backup", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--version", type=int, default=None)
    p.set_defaults(fn=cmd_restore)

    p = sub.add_parser("changes", help="row-level changelog between snapshots")
    p.add_argument("--table", required=True)
    p.add_argument("--since", type=int, required=True)
    p.add_argument("--until", type=int, default=None)
    p.add_argument("--out", default=None, help="write parquet here instead of just counting")
    p.set_defaults(fn=cmd_changes)

    p = sub.add_parser("feeds", help="EWMA-detect state flips over the changelog, publish RSS feeds")
    p.add_argument("--table", required=True)
    p.add_argument("--since", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--keys", required=True, help="comma-separated key columns")
    p.add_argument("--ts-col", default="warc_ts")
    p.add_argument("--value-expr", required=True, help="SQL expression for the monitored value")
    p.add_argument("--tiebreak-col", default=None)
    p.add_argument("--group-col", default=None)
    p.add_argument("--max-items", type=int, default=1000)
    p.set_defaults(fn=cmd_feeds)

    return ap


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    print(json.dumps(args.fn(args), default=str))


if __name__ == "__main__":
    main(sys.argv[1:])
