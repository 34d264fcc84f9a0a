"""Last-writer-wins dedup — the central operator of the CDC engine.

Semantics of ClickHouse ReplacingMergeTree keep-newest (reference
``af/fastpath/fastpath/db.py:82-84``) made explicit and deterministic:
per key keep the row with the greatest ``(version, tie-break...)`` tuple.

Physical strategy: a hash aggregation with ``max_by(payload_struct,
order_struct)``. Catalyst plans this as partial (map-side) + final
aggregation, so every input partition pre-combines its rows per key before
the shuffle — a hot key ships at most one row per upstream partition.
That is the built-in defense against Zipf-skewed keys.

For pathological skew (one key dominating whole partitions *after* other
operators have repartitioned), :func:`lww_latest` also offers an explicit
two-level **salted** aggregation: level 1 groups on ``(key, salt)`` where
salt spreads a hot key over ``salt_buckets`` reducers, level 2 reduces the
≤ ``salt_buckets`` survivors per key. Correctness holds because max is
associative/commutative and the order struct is a total order (ties only
between byte-identical duplicate events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lww_latest(
    df: DataFrame,
    key: str | list[str],
    order_cols: list[str],
    salt_buckets: int = 0,
) -> DataFrame:
    """Keep, per key, the row with max ``order_cols`` (lexicographic)."""
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in df.columns if c not in keys]

    def _reduce(d: DataFrame, groupers: list) -> DataFrame:
        ord_struct = F.struct(*[F.col(c) for c in order_cols])
        val_struct = F.struct(*[F.col(c) for c in payload])
        agg = d.groupBy(*groupers).agg(F.max_by(val_struct, ord_struct).alias("_v"))
        return agg.select(*keys, "_v.*")

    if salt_buckets and salt_buckets > 1:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
        )
        # level 1: hot key split across salt_buckets reducers
        lvl1 = _reduce(salted, [*keys, "_salt"])
        # level 2: final winner among ≤ salt_buckets candidates per key
        return _reduce(lvl1, keys)
    return _reduce(df, keys)


def lww_latest_semi(
    df: DataFrame,
    key: str | list[str],
    order_cols: list[str],
    broadcast_winners: bool = True,
    salt_buckets: int = 0,
) -> DataFrame:
    """LWW keep-newest that never shuffles payload columns.

    Two phases:
    1. *narrow argmax*: aggregate only ``(key, order_cols)`` — tens of
       bytes per row — to find each key's winning version (map-side
       partial aggregation applies, so hot keys pre-combine);
    2. *semi-join back*: filter the original rows to the winning
       ``(key, *order_cols)`` tuples. With ``broadcast_winners`` the winner
       keyset broadcasts, so the (possibly multi-KB-per-row) payload side
       is filtered IN PLACE — zero payload shuffle.

    Requires ``(key, *order_cols)`` to be unique per row (a total order —
    guaranteed here by the (version, epoch, offset) tie-break). For
    micro-batches whose winner keyset would exceed broadcast limits, pass
    ``broadcast_winners=False`` to let AQE pick the join strategy.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    narrow = df.select(*keys, *order_cols)
    if salt_buckets and salt_buckets > 1:
        # two-level salted narrow argmax: hot keys split across reducers
        salted = narrow.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
        )
        lvl1 = salted.groupBy(*keys, "_salt").agg(F.max(ord_struct).alias("_w"))
        win = lvl1.groupBy(*keys).agg(F.max("_w").alias("_w"))
    else:
        win = narrow.groupBy(*keys).agg(F.max(ord_struct).alias("_w"))
    win = win.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in order_cols])
    if broadcast_winners:
        win = F.broadcast(win)
    return df.join(win, on=keys + order_cols, how="left_semi")


def dedup_first_wins(df: DataFrame, key: str | list[str], order_cols: list[str]) -> DataFrame:
    """Keep the *earliest* row per key (reference ``seen_uids`` replay dedup,
    ``reprocessor.py:287-298``) — min_by mirror of :func:`lww_latest`."""
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in df.columns if c not in keys]
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    val_struct = F.struct(*[F.col(c) for c in payload])
    agg = df.groupBy(*keys).agg(F.min_by(val_struct, ord_struct).alias("_v"))
    return agg.select(*keys, "_v.*")
