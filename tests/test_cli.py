"""The operable-command surface (``python -m pipeline_spark``).

The reference is driven as commands (fastpath batch/daemon entry,
detector service, backup scripts); the CLI is the switch-over user's
interface, so every verb is driven end-to-end here: create → replay →
fsck → changes → compact → backup → restore → expire → feeds — each
asserting on the ONE JSON line the command prints. In-process (shared
session) for speed; one subprocess case pins the real ``python -m``
entry point.
"""

import json
import os
import subprocess
import sys

import pytest

from pipeline_spark import cli
from pipeline_spark.datagen import StreamSpec, write_change_stream

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(capsys, *argv) -> dict:
    cli.main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "stream")
    write_change_stream(path, StreamSpec(n_events=2000, n_urls=120, n_epochs=2))
    return path


@pytest.fixture(scope="module")
def work(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_work"))


SCHEMA = "url:string,warc_ts:timestamp,html:binary,text:string,lang:string"


def test_cli_drive_all_verbs(spark, capsys, stream, work):
    table = os.path.join(work, "pages")
    out = run_cli(capsys, "create", "--table", table, "--schema", SCHEMA, "--n-buckets", "4")
    assert out == {"table": table, "version": 0, "n_buckets": 4}

    out = run_cli(
        capsys, "replay", "--stream", stream, "--table", table,
        "--checkpoint", os.path.join(work, "ckpt"), "--max-files", "1",
    )
    assert out["version"] > 0 and out["rows_in"] > 0 and out["batches"] > 0
    replay_version = out["version"]

    out = run_cli(capsys, "fsck", "--table", table)
    assert out["files_checked"] > 0 and out["missing_files"] == [] and out["row_count_mismatches"] == []

    out = run_cli(capsys, "changes", "--table", table, "--since", "0")
    assert out["rows"] > 0

    # changelog rows can also be exported for a downstream job
    chg_dir = os.path.join(work, "chg")
    out = run_cli(capsys, "changes", "--table", table, "--since", "0", "--out", chg_dir)
    assert out["rows"] > 0 and os.path.isdir(chg_dir)

    out = run_cli(capsys, "compact", "--table", table)
    assert out["version"] > replay_version

    from pipeline_spark.lake import LakeTable

    n_rows = LakeTable(spark, table).read().count()

    backup_dir = os.path.join(work, "bkp")
    run_cli(capsys, "backup", "--table", table, "--dest", backup_dir)
    restored = os.path.join(work, "restored")
    out = run_cli(capsys, "restore", "--backup", backup_dir, "--dest", restored)
    assert out["rows"] == n_rows

    feed_dir = os.path.join(work, "feeds")
    out = run_cli(
        capsys, "feeds", "--table", table, "--since", "0", "--out", feed_dir,
        "--keys", "url", "--ts-col", "warc_ts",
        "--value-expr", "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END",
    )
    assert os.path.exists(os.path.join(feed_dir, "global.xml"))
    assert any(p.endswith("global.xml") for p in out["feeds"])

    # expire LAST: it deletes old snapshot metadata, after which
    # changes()/feeds() against the expired versions correctly fail
    out = run_cli(capsys, "expire", "--table", table, "--keep", "1")
    assert out["snapshots_removed"] >= 0


def test_cli_replay_is_fenced_across_invocations(spark, capsys, stream, work):
    """Operational exactly-once: re-running the replay verb — even with a
    BRAND-NEW checkpoint (simulating a lost checkpoint dir after an
    operator error) — applies nothing, because the epoch fence in the
    table's snapshot properties outlives any checkpoint."""
    table = os.path.join(work, "pages")  # replayed by test_cli_drive_all_verbs
    from pipeline_spark.lake import LakeTable

    v0 = LakeTable(spark, table).current_version()
    out = run_cli(
        capsys, "replay", "--stream", stream, "--table", table,
        "--checkpoint", os.path.join(work, "ckpt_fresh"), "--max-files", "1",
    )
    assert out["version"] == v0
    assert out["batches"] == 0 and out["batches_skipped"] > 0


def test_parse_schema_handles_parameterized_types():
    """Top-level-comma split only: decimal(10,2), map<string,int>,
    struct<a:int,b:string> must pass through to Spark intact."""
    got = cli._parse_schema("price:decimal(10,2),tags:map<string,int>,s:struct<a:int,b:string>,url:string")
    assert got == [
        ("price", "decimal(10,2)"),
        ("tags", "map<string,int>"),
        ("s", "struct<a:int,b:string>"),
        ("url", "string"),
    ]


def test_cli_replay_custom_schema_table(spark, capsys, work, tmp_path_factory):
    """A custom-schema table must be replayable through the CLI: without
    --schema the stream would be read with the default CDC DDL, the real
    key/version columns would surface as NULL, and merge's discard filter
    would silently drop every row while the command reports success."""
    import pandas as pd

    d = tmp_path_factory.mktemp("custom_stream")
    pd.DataFrame(
        {
            # user columns + the CDC envelope (op/epoch/offset) every
            # change stream carries by contract
            "op": ["I", "I", "U"],
            "k": ["a", "b", "a"],
            "ver": [1, 1, 2],
            "price": [1.0, 2.0, 3.0],
            "epoch": [0, 0, 0],
            "offset": [0, 1, 2],
        }
    ).to_parquet(str(d / "c0.parquet"))

    table = os.path.join(work, "custom")
    run_cli(
        capsys, "create", "--table", table,
        "--schema", "k:string,ver:bigint,price:double",
        "--key", "k", "--version-col", "ver",
    )
    out = run_cli(
        capsys, "replay", "--stream", str(d), "--table", table,
        "--checkpoint", os.path.join(work, "ck_custom"),
        "--schema", "op:string,k:string,ver:bigint,price:double,epoch:bigint,offset:bigint",
        "--extract", "none",
    )
    assert out["rows_in"] == 3
    from pipeline_spark.lake import LakeTable

    state = {r["k"]: r["price"] for r in LakeTable(spark, table).read().collect()}
    assert state == {"a": 3.0, "b": 2.0}


def test_cli_bad_schema_is_a_clean_error(spark, capsys, work):
    with pytest.raises(SystemExit):
        run_cli(capsys, "create", "--table", os.path.join(work, "x"), "--schema", "nope")


def test_module_entry_point_subprocess(tmp_path):
    """The real ``python -m pipeline_spark`` path: fresh interpreter, one
    verb, one parseable JSON line on stdout."""
    table = str(tmp_path / "t")
    r = subprocess.run(
        [sys.executable, "-m", "pipeline_spark", "--master", "local[2]",
         "create", "--table", table, "--schema", SCHEMA],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["version"] == 0 and os.path.isdir(table)


def test_cli_conf_flag_parses_and_merges():
    from pipeline_spark.session import parse_extra_conf

    ap = cli.build_parser()
    args = ap.parse_args(
        ["--conf", "spark.a=1", "--conf", "spark.b=2;spark.c=x=y", "fsck", "--table", "/t"]
    )
    merged = {}
    for spec in args.conf or []:
        merged.update(parse_extra_conf(spec))
    assert merged == {"spark.a": "1", "spark.b": "2", "spark.c": "x=y"}
    # absent flag stays falsy (no conf applied)
    assert cli.build_parser().parse_args(["fsck", "--table", "/t"]).conf is None
