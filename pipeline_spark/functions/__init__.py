"""Scalar column helpers — the reference's row-level transforms re-expressed
as JVM-side column expressions (SURVEY.md §2.3/§2.9); pandas UDFs only where
a hash primitive has no Spark builtin."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import LongType, StringType


def extract_domain(url: Column) -> Column:
    """Domain from a URL (reference ``extract_input_domain``, db.py:32-42)."""
    return F.parse_url(url, F.lit("HOST"))


def parse_asn(asn: Column) -> Column:
    """'AS123' → 123 (reference db.py:202)."""
    return F.substring(asn, 3, 10).cast("int")


def bool_tf(c: Column) -> Column:
    """boolean → 't'/'f' strings (reference db.py:197-198)."""
    return F.when(c, F.lit("t")).otherwise(F.lit("f"))


def parse_ts(c: Column) -> Column:
    """'%Y-%m-%d %H:%M:%S' parse (reference db.py:203-206)."""
    return F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss")


def flag_wrong_date(ts: Column, received: Column) -> Column:
    """Flag rows whose event time is >1h ahead or >1y behind the receive
    time (reference core.py:1541-1559)."""
    d = F.unix_timestamp(ts) - F.unix_timestamp(received)
    return (d > 3600) | (d < -365 * 24 * 3600)


def clamp_future(ts: Column, now: Column) -> Column:
    """Clamp future timestamps to a *pinned* epoch 'now' so replays stay
    deterministic (reference detector.py:299-313 breaks determinism by using
    wall clock; we require the caller to pin it)."""
    return F.least(ts, now)


@F.pandas_udf(StringType())
def trivial_id_udf(day: pd.Series, raw: pd.Series) -> pd.Series:
    """Deterministic sortable row id: '01' + YYYYMMDD + shake_128(raw)[:30]
    (semantics of reference utils.py:1692-1711; shake_128 has no Spark
    builtin so this stays an Arrow-batched UDF)."""

    def one(d, b):
        if b is None:
            return None
        return "01" + d + hashlib.shake_128(b).hexdigest(15)

    return pd.Series([one(d, b) for d, b in zip(day, raw)])


@F.pandas_udf(StringType())
def legacy_report_id_udf(start_time: pd.Series, header: pd.Series) -> pd.Series:
    """P9: legacy report-id synthesis — deterministic 50-ascii-letter id
    derived from sha512 of a header blob, prefixed by the start time
    (shape of reference normalize.py:568-590; exact byte mapping differs —
    the reference's ids are synthetic too, determinism is the contract)."""

    def one(t, h):
        if h is None or t is None:
            return None
        dig = hashlib.sha512(h).digest()
        letters = "".join(chr(ord("A") + (b % 26)) for b in dig[:50])
        return f"{t}_{letters}"

    return pd.Series([one(t, h) for t, h in zip(start_time, header)])


@F.pandas_udf(LongType())
def simhash64_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens, md5-based feature hashing
    (semantics of reference ``gen_simhash`` normalize.py:141-158, widened
    from 32 to 64 bits).

    Hash = first 8 md5 digest bytes LITTLE-endian (== DuckDB's
    ``md5_number_upper``, which makes the whole simhash oracle-expressible
    in SQL — the endianness is just a fixed bit permutation, equally valid).

    numpy-vectorized per Arrow batch: each UNIQUE token is md5'd once,
    the 64 sign bits of all token hashes unpack into one ±1 matrix, and
    per-document bit sums are a single ``np.add.at`` scatter — no
    per-token Python inner loop (the naive form ran a 64-iteration pure-
    Python loop per token occurrence, ~100× slower)."""
    import numpy as np

    n = len(text)
    tok_ids: list[int] = []  # one entry per token OCCURRENCE
    doc_ids: list[int] = []
    uniq: dict[str, int] = {}
    live = np.zeros(n, dtype=bool)
    for di, t in enumerate(text):
        if t is None:
            continue
        live[di] = True
        for tok in t.split():
            tid = uniq.setdefault(tok, len(uniq))
            tok_ids.append(tid)
            doc_ids.append(di)
    out = pd.array([None] * n, dtype="Int64")
    if uniq:
        hashes = np.fromiter(
            (int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little") for tok in uniq),
            dtype=np.uint64,
            count=len(uniq),
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
        pm = bits * 2 - 1  # (unique tokens, 64) of ±1
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, np.asarray(doc_ids), pm[np.asarray(tok_ids)])
        sim = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        signed = sim.astype(np.int64)  # two's complement reinterpret
        for di in np.flatnonzero(live):
            out[di] = int(signed[di])
    else:
        for di in np.flatnonzero(live):
            out[di] = 0
    return pd.Series(out)


def canonicalize(c: Column, mapping: dict[str, str], keep_unknown: bool = True) -> Column:
    """Name-canonicalization map (P13 — the reference's test-name renames,
    normalize.py:25-75): known values map through a literal map expression
    (JVM lookup, no UDF); unknown values pass through (or null out)."""
    lits = []
    for k, v in mapping.items():
        lits += [F.lit(k), F.lit(v)]
    looked = F.element_at(F.create_map(*lits), c)
    return F.coalesce(looked, c) if keep_unknown else looked


def knuth_unit(c: Column) -> Column:
    """Deterministic pseudo-uniform in [0,1) from an integer key — pure
    BIGINT arithmetic so Spark and DuckDB produce identical values (used
    where the reference used ``random()``: weighted sampling, prio.py)."""
    return (F.pmod(c.cast("long") * F.lit(2654435761), F.lit(4294967296)) / F.lit(4294967296.0))
