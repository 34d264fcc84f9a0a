"""Weighted sampling — the reference's priority sampler re-expressed.

The reference implements Chao's streaming weighted reservoir
(``af/prio/prio.py:95-113``, ``algo_chao``). The distributed equivalent is
the Efraimidis–Spirakis A-ExpJ scheme: key each row with ``u^(1/weight)``
(u uniform) and take the global top-k — embarrassingly parallel, one
shuffle for the top-k.

For bit-reproducibility (and DuckDB-oracle checkability) we replace the
uniform draw with a deterministic integer-arithmetic pseudo-uniform
(:func:`pipeline_spark.functions.knuth_unit`), keyed on the row id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pipeline_spark.functions import knuth_unit


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted k-sample (per group if ``by`` given).

    P(row selected) ∝ weight, via key = u^(1/w) top-k (A-ExpJ).

    Global case (``by=None``) uses ``orderBy().limit(k)`` — Spark plans
    that as TakeOrderedAndProject: every partition keeps its local top-k
    and only k rows per partition reach the driver-side merge. A
    ``Window.partitionBy(lit(1))`` here would funnel the WHOLE dataset
    through one task — the single-partition global sort anti-pattern."""
    u = knuth_unit(F.col(id_col))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    keyed = df.withColumn("_sk", key)
    if not by:
        return keyed.orderBy(F.desc("_sk"), F.asc(id_col)).limit(k).drop("_sk")
    w = Window.partitionBy(*by).orderBy(F.desc("_sk"), F.asc(id_col))
    ranked = keyed.withColumn("_rank", F.row_number().over(w))
    return ranked.filter(F.col("_rank") <= k).drop("_sk", "_rank")
