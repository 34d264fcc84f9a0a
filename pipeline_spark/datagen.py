"""Deterministic synthetic CDC change stream of web pages.

Produces the binlog/WAL-shaped ``change_events`` stream from FIXTURES.md §2:

    op:string  url:string  warc_ts:timestamp  html:binary  lang:string
    epoch:long  offset:long

Everything is seeded (numpy ``RandomState``) and wall-clock-free so replays
are bit-reproducible (the determinism discipline of the reference replay
path, ``af/fastpath/fastpath/reprocessor.py:21,396-399``). Files land as
``ep-NNNN/part-00000.parquet`` (epoch also a column) so Structured
Streaming's file source can consume them incrementally; LWW makes the
result order-insensitive.

Skew: urls are drawn Zipf(s) so a handful of hot urls carry a large share
of events — this drives the salted-LWW / AQE-skew requirements.
Crafted payload edge cases (invalid UTF-8, embedded NUL, empty, ~1 MiB
bodies) exercise the extraction invariant.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = np.datetime64("2024-01-01T00:00:00")
LANGS = np.array(["en", "de", "fr", "es", "zh", "ru", "pt", "ja", "it", "zz"])

ARROW_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
        ("epoch", pa.int64()),
        ("offset", pa.int64()),
    ]
)

SPARK_DDL = "op string, url string, warc_ts timestamp, html binary, lang string, epoch long, offset long"


@dataclass(frozen=True)
class StreamSpec:
    seed: int = 42
    n_events: int = 10_000
    n_urls: int = 1_000
    n_epochs: int = 4
    zipf_s: float = 1.2
    dup_fraction: float = 0.02  # exact duplicate events (idempotency)
    late_fraction: float = 0.10  # out-of-order warc_ts
    future_fraction: float = 0.01  # warc_ts > 1h ahead of stream time
    invalid_fraction: float = 0.01  # NULL url / NULL warc_ts → must be discarded
    delete_fraction: float = 0.02  # op = 'D'
    edge_fraction: float = 0.01  # crafted html edge cases
    big_body_every: int = 50_000  # one >1MiB body per this many events (0=off)
    body_paras: int = 1  # filler <p> paragraphs per body (sizes the page)


def _zipf_probs(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


_EDGE_BODIES = [
    b"",  # empty
    b"\xff\xfe<p>invalid prefix</p>",  # invalid UTF-8
    b"<p>nul\x00inside\x00</p>",  # embedded NULs
    b"<p>ok &amp; fine &lt;tag&gt;</p>",  # entities
    "<p>unicode é中文</p>".encode(),  # multibyte
    b"<script>var x = '<p>not text</p>';</script><p>after</p>",
    b"<!-- note --><P CLASS='x'>upper\ttab</P>\n\n\n\n<p>gap</p>",
    b"\x80\x81\x82",  # pure garbage bytes
]


def generate_epoch(spec: StreamSpec, epoch: int) -> pd.DataFrame:
    """One epoch of events as pandas; independent RNG per (seed, epoch)."""
    rs = np.random.RandomState(spec.seed * 1_000_003 + epoch)
    n = spec.n_events // spec.n_epochs
    probs = _zipf_probs(spec.n_urls, spec.zipf_s)
    url_ids = rs.choice(spec.n_urls, size=n, p=probs)

    # offsets are the total order inside the epoch
    offsets = np.arange(n, dtype=np.int64)
    # event time tracks stream position (1s apart), epochs back-to-back
    seq = epoch * n + offsets
    ts = BASE_TS + seq.astype("timedelta64[s]")
    late = rs.rand(n) < spec.late_fraction
    ts[late] -= (rs.randint(60, 86_400, size=int(late.sum()))).astype("timedelta64[s]")
    future = rs.rand(n) < spec.future_fraction
    ts[future] += (rs.randint(3_700, 86_400, size=int(future.sum()))).astype("timedelta64[s]")

    ops = np.where(rs.rand(n) < spec.delete_fraction, "D", "U")
    langs = LANGS[url_ids % len(LANGS)].copy()

    urls: list[str | None] = [f"https://site-{u % 97}.example.com/page/{u}" for u in url_ids]
    rev = seq
    html: list[bytes | None] = []
    edge = rs.rand(n) < spec.edge_fraction
    for i in range(n):
        if ops[i] == "D":
            html.append(None)
            continue
        if edge[i]:
            html.append(_EDGE_BODIES[int(url_ids[i]) % len(_EDGE_BODIES)])
        elif spec.big_body_every and seq[i] % spec.big_body_every == spec.big_body_every - 1:
            html.append(b"<p>" + (b"big chunk of body text " * 50_000) + b"</p>")  # ~1.2 MiB
        else:
            filler = "".join(
                f"<p>paragraph {j} of page {url_ids[i]} rev {rev[i]} with <b>markup</b> "
                f"and some body text that resembles a crawled web page &amp; more</p>"
                for j in range(spec.body_paras)
            )
            html.append(
                (
                    f"<html><head><title>page {url_ids[i]}</title>"
                    f"<style>p {{color: red}}</style></head>"
                    f"<body><h1>Page {url_ids[i]}</h1>"
                    f"<p>revision {rev[i]} of page {url_ids[i]} &amp; content</p>{filler}"
                    f"<script>track({rev[i]});</script></body></html>"
                ).encode()
            )

    ts_series = pd.Series(ts)
    # invalid rows: NULL url or NULL warc_ts (discard-filter fodder,
    # analog of reference core.py:1580-1593)
    inv = rs.rand(n) < spec.invalid_fraction
    if inv.any():
        kill_url = rs.rand(n) < 0.5
        for i in np.flatnonzero(inv):
            if kill_url[i]:
                urls[i] = None
            else:
                ts_series.iat[i] = pd.NaT

    pdf = pd.DataFrame(
        {
            "op": ops,
            "url": urls,
            "warc_ts": ts_series,
            "html": html,
            "lang": langs,
            "epoch": np.full(n, epoch, dtype=np.int64),
            "offset": offsets,
        }
    )

    # exact duplicates (same url/warc_ts/html, later offset) — idempotency
    # fodder, analog of seen_uids dedup at reference reprocessor.py:287-298
    n_dup = int(n * spec.dup_fraction)
    if n_dup:
        dup_src = rs.randint(0, n, size=n_dup)
        dup = pdf.iloc[dup_src].copy()
        dup["offset"] = np.arange(n, n + n_dup, dtype=np.int64)
        pdf = pd.concat([pdf, dup], ignore_index=True)
    return pdf


def write_change_stream(path: str, spec: StreamSpec) -> list[str]:
    """Write the stream as epoch=NNNN/part-00000.parquet dirs; returns dirs."""
    dirs = []
    for e in range(spec.n_epochs):
        d = os.path.join(path, f"ep-{e:04d}")
        os.makedirs(d, exist_ok=True)
        pdf = generate_epoch(spec, e)
        table = pa.Table.from_pandas(pdf[["op", "url", "warc_ts", "html", "lang", "epoch", "offset"]], schema=ARROW_SCHEMA, preserve_index=False)
        # small row groups so Spark's scan parallelizes WITHIN a file
        # (a single-row-group file caps the scan at one task per file)
        pq.write_table(table, os.path.join(d, "part-00000.parquet"), row_group_size=8192)
        dirs.append(d)
    return dirs


def lww_oracle(pdfs: list[pd.DataFrame], extract_fn) -> pd.DataFrame:
    """Pure-Python LWW apply — the oracle for the merge engine.

    Keeps, per url, the event with max (warc_ts, epoch, offset); rows whose
    winning event is a delete become tombstones (excluded). Invalid rows
    (NULL url / warc_ts) are discarded first. Mirrors ReplacingMergeTree
    keep-newest semantics (reference af/fastpath/fastpath/db.py:82-84) with
    an explicit total-order tie-break.
    """
    state: dict[str, tuple] = {}
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            if row.url is None or pd.isna(row.warc_ts):
                continue
            key = (row.warc_ts, row.epoch, row.offset)
            cur = state.get(row.url)
            if cur is None or key > cur[0]:
                state[row.url] = (key, row.op, row.html, row.lang)
    out = []
    for url, (key, op, html, lang) in state.items():
        if op == "D":
            continue
        out.append(
            {
                "url": url,
                "warc_ts": key[0],
                "html": html,
                "text": extract_fn(html),
                "lang": lang,
            }
        )
    return (
        pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])
        .sort_values("url")
        .reset_index(drop=True)
    )
