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


def narrow_winners(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    salt_buckets: int = 0,
    keep: str = "max",
) -> DataFrame:
    """Per-key winning ``order_cols`` tuple via a NARROW argmax/argmin.

    Aggregates only ``(keys, order_cols)`` — tens of bytes per row — so
    map-side partial aggregation pre-combines hot keys and the payload
    never enters the aggregation (the ObjectHashAggregate sort-fallback
    trap). ``salt_buckets>0`` opts into an explicit two-level salted
    reduction for pathological in-partition skew. ``keep="min"`` selects
    the EARLIEST tuple instead (first-wins / insert-only semantics,
    reference ON CONFLICT DO NOTHING, reprocessor.py:77-97).
    """
    assert keep in ("max", "min")
    agg = F.max if keep == "max" else F.min
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    narrow = df.select(*keys, *order_cols)
    if salt_buckets and salt_buckets > 1:
        # two-level salted narrow argmax: hot keys split across reducers
        salted = narrow.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
        )
        lvl1 = salted.groupBy(*keys, "_salt").agg(agg(ord_struct).alias("_w"))
        win = lvl1.groupBy(*keys).agg(agg("_w").alias("_w"))
    else:
        win = narrow.groupBy(*keys).agg(agg(ord_struct).alias("_w"))
    return win.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in order_cols])


#: "auto" broadcast regime: broadcast the winner keyset only while it is
#: small enough that (rows × ~60 B) stays well under executor/driver memory.
AUTO_BROADCAST_MAX_WINNERS = 4_000_000


def lww_latest_semi(
    df: DataFrame,
    key: str | list[str],
    order_cols: list[str],
    broadcast_winners: bool | str = True,
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
    guaranteed here by the (version, epoch, offset) tie-break).

    ``broadcast_winners`` size-gates the join strategy:
      * ``True`` — caller knows the winner keyset is small (bounded
        micro-batches): unconditional broadcast, zero extra jobs;
      * ``False`` — shuffled semi-join on the key; AQE may still convert
        to broadcast at runtime if the winner side measures small;
      * ``"auto"`` — materialize the (narrow) winner keyset once
        (``localCheckpoint``), count it, and broadcast only under
        :data:`AUTO_BROADCAST_MAX_WINNERS`. At 10^10 keys the winner set
        is tens of GB — broadcasting it through the driver would OOM, so
        unbounded inputs (historical backfills) must use auto/False.
    """
    keys = [key] if isinstance(key, str) else list(key)
    win = narrow_winners(df, keys, order_cols, salt_buckets=salt_buckets)
    if broadcast_winners == "auto":
        win = win.localCheckpoint(eager=True)  # also avoids recomputing the argmax in the join
        do_broadcast = win.count() <= AUTO_BROADCAST_MAX_WINNERS
    else:
        do_broadcast = bool(broadcast_winners)
    if do_broadcast:
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
