"""Incremental matview maintenance over the changelog: after every merge,
folding the delta into the running aggregate must equal a full recompute
from the live table (the reference's counters-refresh contract,
database_upgrade_schema.py:124-192 fed like clickhouse_feeder.py:56-135)."""

import pandas as pd
from pyspark.sql import functions as F

from pipeline_spark.datagen import StreamSpec, generate_epoch
from pipeline_spark.lake import LakeTable
from pipeline_spark.plans.incremental import full_refresh, incremental_refresh
from tests.test_lake_merge import PAGE_SCHEMA, make_table, spark_batch


def _measures(df):
    return {
        "n": F.lit(1),
        "total_chars": F.coalesce(F.length("text").cast("long"), F.lit(0)),
    }


def _as_dict(df):
    return {
        r["lang"]: (r["n"], r["total_chars"])
        for r in df.collect()
    }


def test_incremental_equals_full_after_every_merge(spark, tmp_path):
    spec = StreamSpec(n_events=6_000, n_urls=250, n_epochs=3)
    t = make_table(spark, tmp_path, "incr")
    state = None
    since = t.current_version()
    for e in range(spec.n_epochs):
        t.merge(spark_batch(spark, generate_epoch(spec, e)), fence=("s", e))
        state = incremental_refresh(
            t, state, ["lang"], _measures, since_version=since
        ).localCheckpoint(eager=True)
        since = t.current_version()
        full = full_refresh(t, ["lang"], _measures)
        assert _as_dict(state) == _as_dict(full), f"divergence after epoch {e}"
    # deletes must have retracted: total rows equals live count
    assert sum(n for n, _ in _as_dict(state).values()) == t.read().count()


def test_incremental_noop_delta(spark, tmp_path):
    """A refresh over an empty changelog leaves the state unchanged."""
    spec = StreamSpec(n_events=1_000, n_urls=80, n_epochs=1)
    t = make_table(spark, tmp_path, "incr2")
    t.merge(spark_batch(spark, generate_epoch(spec, 0)))
    v = t.current_version()
    state = incremental_refresh(t, None, ["lang"], _measures, since_version=0, until_version=v)
    again = incremental_refresh(t, state, ["lang"], _measures, since_version=v, until_version=v)
    assert _as_dict(state) == _as_dict(again)


def test_streaming_replay_maintains_matview_per_batch(spark, tmp_path):
    """K5 consumer pattern: the replay's on_batch_committed hook folds each
    commit's changelog into the running aggregate; after the stream drains,
    the incrementally-maintained state equals a full recompute — and a
    fenced re-replay fires no hook calls."""
    from pipeline_spark.datagen import StreamSpec, write_change_stream
    from pipeline_spark.streaming import replay_stream
    from tests.test_lake_merge import PAGE_SCHEMA

    spec = StreamSpec(n_events=4_000, n_urls=200, n_epochs=4)
    stream = str(tmp_path / "mstream")
    write_change_stream(stream, spec)
    t = LakeTable.create(spark, str(tmp_path / "mpages"), PAGE_SCHEMA, n_buckets=8)

    holder = {"state": None, "since": t.current_version(), "calls": 0}

    def on_commit(batch_id, lineage, table):
        holder["calls"] += 1
        holder["state"] = incremental_refresh(
            table, holder["state"], ["lang"], _measures, since_version=holder["since"]
        ).localCheckpoint(eager=True)
        holder["since"] = table.current_version()

    replay_stream(
        spark, stream, t, checkpoint=str(tmp_path / "mck"),
        max_files_per_trigger=1, on_batch_committed=on_commit,
    )
    assert holder["calls"] == spec.n_epochs
    assert _as_dict(holder["state"]) == _as_dict(full_refresh(t, ["lang"], _measures))

    # fenced re-replay: no commits → no hook firings → state untouched
    before = _as_dict(holder["state"])
    replay_stream(
        spark, stream, t, checkpoint=str(tmp_path / "mck2"),
        max_files_per_trigger=1, on_batch_committed=on_commit,
    )
    assert holder["calls"] == spec.n_epochs
    assert _as_dict(holder["state"]) == before
