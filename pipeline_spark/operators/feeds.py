"""RSS-feed export of detector change events (the last unmapped reference
behavior: ``af/detector/detector/detector.py:627-708`` renders a global
feed plus per-country feeds from recent Change events and publishes each
atomically via tmp-file + rename).

Spark-first shape:

* the feed body is BOUNDED (the reference keeps a deque of the most
  recent 1000 changes), so the driver-side materialization is O(max_items
  x n_feeds), never O(data) — the top-k cut runs distributed
  (``TakeOrderedAndProject`` for the global feed, windowed top-k per
  group for the grouped feeds) before anything reaches the driver;
* grouped feeds are one FILE per group, so the group column must be
  low-cardinality (the reference groups by country code, ~250 values) —
  documented, not guessed: the caller picks the column;
* rendering is DETERMINISTIC: items order on (ts desc, key asc) with the
  row's own timestamp as pubdate, and lastBuildDate is the max item
  timestamp (data-derived). The reference stamps ``updateddate=utcnow``,
  which makes its feeds unreproducible run-over-run; byte-identity on
  replay is a property this engine's exports guarantee (same discipline
  as operators/export.py), so the wall clock stays out of the bytes.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, functions as F


_DAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


def _fmt_ts(v) -> str:
    """RFC 822 timestamp like feedgenerator's (UTC, stable). Day/month
    names come from explicit English tables, not strftime's %a/%b —
    those are locale-dependent, which would break both RFC 822 validity
    and the module's byte-identity guarantee under e.g. LC_TIME=de_DE."""
    return (
        f"{_DAYS[v.weekday()]}, {v.day:02d} {_MONTHS[v.month - 1]} {v.year:04d} "
        f"{v.hour:02d}:{v.minute:02d}:{v.second:02d} +0000"
    )


def render_rss(items: list[dict], title: str, link: str, description: str) -> str:
    """Pure RSS 2.0 rendering of pre-ordered change items. Each item dict
    carries ``key`` (the blocked entity), ``blocked`` (bool), ``ts``
    (datetime) and optionally ``link``."""
    out = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<rss version="2.0">',
        "<channel>",
        f"<title>{escape(title)}</title>",
        f"<link>{escape(link)}</link>",
        f"<description>{escape(description)}</description>",
        "<language>en</language>",
    ]
    if items:
        out.append(f"<lastBuildDate>{_fmt_ts(max(i['ts'] for i in items))}</lastBuildDate>")
    for i in items:
        un = "" if i["blocked"] else "un"
        out.extend(
            [
                "<item>",
                f"<title>{escape(str(i['key']))} {un}blocked</title>",
                f"<link>{escape(i.get('link') or link)}</link>",
                f"<description>Change detected on {_fmt_ts(i['ts'])}</description>",
                f"<pubDate>{_fmt_ts(i['ts'])}</pubDate>",
                "</item>",
            ]
        )
    out.extend(["</channel>", "</rss>", ""])
    return "\n".join(out)


def _safe_name(group_value: str) -> str:
    """Filename-safe rendering of a group value: anything outside
    [A-Za-z0-9._-] maps to '_' (and a leading '.' too, so '..' cannot
    escape the feed directory). Group values are low-cardinality codes by
    contract, so collisions after mapping are a caller bug, not a hazard."""
    import re

    safe = re.sub(r"[^A-Za-z0-9._-]", "_", group_value) or "_"
    return "_" + safe[1:] if safe.startswith(".") else safe


def write_feed(xml: str, path: str) -> None:
    """Atomic publish: write to a tmp sibling, fsync, rename — a reader
    never sees a torn feed (reference write_feed, detector.py:627-634)."""
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(xml)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def publish_change_feeds(
    changes: DataFrame,
    out_dir: str,
    key_col: str = "key",
    ts_col: str = "ts",
    blocked_col: str = "blocked",
    group_col: str | None = None,
    max_items: int = 1000,
    title: str = "pipeline_spark change events",
    link: str = "https://example.invalid/changes",
    description: str = "Blocking state flips detected by the EWMA detector",
) -> dict:
    """Render ``changes`` (the :func:`detect_changes_batch` output — one
    row per state flip) into ``<out_dir>/global.xml`` plus, when
    ``group_col`` is given, ``<out_dir>/by-<group_col>/<value>.xml``.

    Returns ``{feed_path: n_items}``. Only the most recent ``max_items``
    flips reach each feed; the cut is distributed (global: ascending
    rank == TakeOrderedAndProject; grouped: windowed top-k per group) so
    the driver handles O(max_items x n_feeds) rows total.
    """
    order = [F.col(ts_col).desc(), F.col(key_col).asc()]
    written: dict[str, int] = {}

    top = changes.select(key_col, ts_col, blocked_col).orderBy(*order).limit(max_items)
    rows = top.collect()
    items = [{"key": r[key_col], "ts": r[ts_col], "blocked": r[blocked_col]} for r in rows]
    gpath = os.path.join(out_dir, "global.xml")
    write_feed(render_rss(items, title, link, description), gpath)
    written[gpath] = len(items)

    if group_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(*order)
        per = (
            changes.select(group_col, key_col, ts_col, blocked_col)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_items)
            .drop("_rn")
        )
        by_group: dict[str, list[dict]] = {}
        for r in per.collect():
            if r[group_col] is None:
                continue  # no feed identity; the flip still reaches global.xml
            by_group.setdefault(str(r[group_col]), []).append(
                {"key": r[key_col], "ts": r[ts_col], "blocked": r[blocked_col]}
            )
        for g in sorted(by_group):
            # deterministic total order: key asc, then STABLE ts desc
            gitems = sorted(by_group[g], key=lambda i: str(i["key"]))
            gitems.sort(key=lambda i: i["ts"], reverse=True)
            path = os.path.join(out_dir, f"by-{group_col}", f"{_safe_name(g)}.xml")
            write_feed(render_rss(gitems, f"{title} — {group_col}={g}", link, description), path)
            written[path] = len(gitems)
    return written
