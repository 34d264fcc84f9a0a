"""Incrementally-maintained derived aggregates over the lake changelog —
the materialized-view refresh path.

The reference maintains counters tables by re-running grouped INSERT
SELECTs over what changed since a watermark (matview family
``af/analysis/analysis/database_upgrade_schema.py:85-192``, fed CDC-style
by ``clickhouse_feeder.py:56-135``). Spark-native form: consume
:meth:`LakeTable.changes` between two snapshots and fold the delta into a
grouped-sums state with retract + add semantics:

* **retract**: the changed keys' OLD live rows (scan at ``since``,
  semi-joined to the delta keys — bucket co-located, payload untouched)
  leave the aggregate with negated measures;
* **add**: the delta's new winners (minus deletes) enter it;
* state' = (state ∪ add ∪ retract) re-grouped — one narrow shuffle over
  group keys, O(changed keys), never O(table).

Measures must be sum-decomposable (count = sum(1), sum(x)); a measure
named ``n`` (the row count) is required so groups that empty out are
dropped. ``incremental == full recompute`` is asserted in
tests/test_incremental.py at every refresh step.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, functions as F

from pipeline_spark.lake import LakeTable

MeasureFn = Callable[[DataFrame], Mapping[str, Column]]


def grouped_sums(df: DataFrame, group_cols: list[str], measures: Mapping[str, Column]) -> DataFrame:
    """Sum-decomposable grouped aggregate (the matview shape). ``measures``
    maps output name → per-row contribution expression; ``n`` must map to
    the row-count contribution (lit(1))."""
    assert "n" in measures, "a row-count measure named 'n' is required"
    aggs = [F.sum(expr).alias(name) for name, expr in measures.items()]
    return df.groupBy(*group_cols).agg(*aggs)


def full_refresh(table: LakeTable, group_cols: list[str], measures_fn: MeasureFn) -> DataFrame:
    """Recompute the aggregate from the full live state (the correctness
    baseline the incremental path must equal)."""
    live = table.read()
    return grouped_sums(live, group_cols, measures_fn(live))


def incremental_refresh(
    table: LakeTable,
    state: DataFrame | None,
    group_cols: list[str],
    measures_fn: MeasureFn,
    since_version: int,
    until_version: int | None = None,
) -> DataFrame:
    """Fold the changelog between two snapshots into ``state``.

    ``state`` is the aggregate as of ``since_version`` (None = empty).
    Returns the aggregate as of ``until_version`` — materialize it
    (write/localCheckpoint) before the next refresh so each step costs one
    delta, not a replay. Join strategies are left to AQE: the changed-key
    set is bounded by the delta size, so it converts to broadcast at
    runtime whenever it measures small.
    """
    until = table.current_version() if until_version is None else until_version
    key = table.meta()["key"]
    delta = table.changes(since_version, until)
    changed = delta.select(key).distinct()
    before = table.scan(version=since_version).join(changed, on=key, how="left_semi")

    add_src = delta.filter(F.col("_change_type") == "upsert").drop("_change_type")
    add = grouped_sums(add_src, group_cols, measures_fn(add_src))
    neg_agg = grouped_sums(before, group_cols, measures_fn(before))
    names = [c for c in neg_agg.columns if c not in group_cols]
    neg = neg_agg.select(*group_cols, *[(-F.col(c)).alias(c) for c in names])

    parts = [p for p in (state, add, neg) if p is not None]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    folded = unioned.groupBy(*group_cols).agg(*[F.sum(c).alias(c) for c in names])
    return folded.filter(F.col("n") != 0)
