"""Streaming EWMA change detection — the reference detector's live mode
(``af/detector/detector/detector.py:375-469,908-922``) as a Structured
Streaming stateful query.

Shares the fold kernel with the batch form
(:mod:`pipeline_spark.operators.detector`), so warmup (historical replay)
and live tailing are the same operator — the reference's warmup/live
unification (detector.py:255,587). State (mean, blocked, n) is carried by
Spark's state store across micro-batches, replacing the reference's pickle
snapshots (detector.py:790-835) with checkpointed state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pipeline_spark.operators.detector import _fold

OUTPUT_SCHEMA = "key string, ts timestamp, mean double, blocked boolean"
STATE_SCHEMA = "mean double, blocked boolean, n long"


def ewma_update(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: fold new rows (time-ordered)
    into (mean, blocked), emit one row per hysteresis flip."""
    if state.exists:
        mean, blocked, n = state.get
    else:
        mean, blocked, n = 0.0, False, 0
    # applyInPandasWithState delivers a group as MULTIPLE Arrow chunks
    # (maxRecordsPerBatch-sized); folding chunks independently would apply
    # rows out of global time order for any group larger than one chunk.
    # Materialize, then ONE stable sort over the whole micro-batch group
    # ((ts, value) so equal-ts rows fold deterministically).
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    changes = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "value"], kind="stable")
        changes, mean, blocked = _fold(pdf["value"].tolist(), pdf["ts"].tolist(), mean, blocked)
        n += len(pdf)
    state.update((float(mean), bool(blocked), int(n)))
    if changes:
        yield pd.DataFrame(
            [{"key": key[0], "ts": t, "mean": m, "blocked": b} for t, m, b in changes]
        )


def detect_changes_stream(events_stream, key_col: str = "key"):
    """Wire the stateful operator onto a streaming DataFrame with columns
    (key, ts, value). Returns the change-event stream (append mode)."""
    return (
        events_stream.groupBy(key_col)
        .applyInPandasWithState(
            ewma_update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
