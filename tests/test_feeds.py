"""RSS export of detector change events (reference detector.py:627-708):
deterministic rendering, atomic publish, byte-identical on replay."""

import os
import xml.etree.ElementTree as ET
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from pipeline_spark.operators.detector import detect_changes_batch
from pipeline_spark.operators.feeds import publish_change_feeds, render_rss, write_feed

T0 = datetime(2024, 1, 1)


def _history(spark):
    """Two keys flipping blocked state: k0 flips on (5 high values after
    5 low), k1 flips on then off again."""
    rows = []
    for i in range(30):
        rows.append(("k0", "us", T0 + timedelta(hours=i), 0.9 if i >= 15 else 0.0, i))
    for i in range(90):
        v = 0.9 if 8 <= i < 16 else 0.0
        rows.append(("k1", "de", T0 + timedelta(hours=i), v, 100 + i))
    return spark.createDataFrame(rows, "key string, cc string, ts timestamp, value double, event_id long")


def test_feed_is_valid_rss_and_orders_items(spark, tmp_path):
    changes = detect_changes_batch(_history(spark), ["key", "cc"], tiebreak_col="event_id")
    out = publish_change_feeds(changes, str(tmp_path), group_col="cc")
    gpath = str(tmp_path / "global.xml")
    assert gpath in out and out[gpath] >= 3
    root = ET.parse(gpath).getroot()
    assert root.tag == "rss" and root.get("version") == "2.0"
    items = root.findall("./channel/item")
    assert len(items) == out[gpath]
    titles = [i.findtext("title") for i in items]
    assert any("k0 blocked" in t for t in titles)
    assert any("k1 unblocked" in t for t in titles)
    # most-recent first
    dates = [i.findtext("pubDate") for i in items]
    assert dates == sorted(dates, key=lambda s: datetime.strptime(s, "%a, %d %b %Y %H:%M:%S +0000"), reverse=True)
    # grouped feeds: one file per cc, valid XML
    for cc in ("us", "de"):
        p = str(tmp_path / "by-cc" / f"{cc}.xml")
        assert os.path.exists(p)
        assert ET.parse(p).getroot().tag == "rss"


def test_feed_replay_is_byte_identical(spark, tmp_path):
    """The whole path twice — detector fold, top-k cut, render, atomic
    publish — must produce the SAME BYTES (the reference's utcnow
    updateddate makes its feeds unreproducible; ours are replayable)."""
    h = _history(spark)
    a = publish_change_feeds(detect_changes_batch(h, ["key", "cc"], tiebreak_col="event_id"),
                             str(tmp_path / "a"), group_col="cc")
    b = publish_change_feeds(detect_changes_batch(h, ["key", "cc"], tiebreak_col="event_id"),
                             str(tmp_path / "b"), group_col="cc")
    assert {os.path.relpath(p, tmp_path / "a") for p in a} == {os.path.relpath(p, tmp_path / "b") for p in b}
    for pa in a:
        pb = os.path.join(str(tmp_path / "b"), os.path.relpath(pa, tmp_path / "a"))
        assert open(pa, "rb").read() == open(pb, "rb").read(), pa


def test_feed_max_items_cut_is_distributed_topk(spark, tmp_path):
    changes = detect_changes_batch(_history(spark), ["key", "cc"], tiebreak_col="event_id")
    out = publish_change_feeds(changes, str(tmp_path), max_items=1)
    assert out[str(tmp_path / "global.xml")] == 1
    # the global cut plans as a local top-k, not a global sort
    top = changes.orderBy(F.col("ts").desc(), F.col("key").asc()).limit(1)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_fmt_ts_is_rfc822_and_locale_independent():
    """Day/month names come from explicit English tables — strftime's
    %a/%b are locale-dependent, which would break RFC 822 validity and
    byte-identity under e.g. LC_TIME=de_DE."""
    from pipeline_spark.operators.feeds import _fmt_ts

    assert _fmt_ts(datetime(2024, 1, 1, 9, 5, 3)) == "Mon, 01 Jan 2024 09:05:03 +0000"
    assert _fmt_ts(datetime(2023, 12, 31, 23, 59, 59)) == "Sun, 31 Dec 2023 23:59:59 +0000"


def test_group_values_cannot_escape_feed_dir(spark, tmp_path):
    """A hostile/odd group value ('../..', slashes, NULL) must map to a
    file INSIDE out_dir/by-<col>/, never traverse out or nest dirs."""
    rows = []
    for cc in ("../evil", "a/b", None):
        for i in range(20):
            rows.append((f"k_{cc}", cc, T0 + timedelta(hours=i), 0.9 if i >= 10 else 0.0, i))
    df = spark.createDataFrame(rows, "key string, cc string, ts timestamp, value double, event_id long")
    changes = detect_changes_batch(df, ["key", "cc"], tiebreak_col="event_id")
    out = publish_change_feeds(changes, str(tmp_path), group_col="cc")
    by_cc = tmp_path / "by-cc"
    for p in out:
        if "by-cc" in p:
            assert os.path.dirname(os.path.abspath(p)) == str(by_cc.resolve())
    # every written grouped feed is a direct child — nothing escaped
    assert not (tmp_path.parent / "evil.xml").exists()
    assert sorted(f.name for f in by_cc.iterdir()) == ["_._evil.xml", "a_b.xml"]


def test_write_feed_is_atomic(tmp_path):
    p = str(tmp_path / "feed.xml")
    write_feed(render_rss([], "t", "l", "d"), p)
    first = open(p, "rb").read()
    write_feed(render_rss([{"key": "x", "blocked": True, "ts": T0}], "t", "l", "d"), p)
    second = open(p, "rb").read()
    assert first != second and b"<item>" in second
    assert not os.path.exists(p + ".tmp")


def test_feed_from_replayed_lake_changes(spark, tmp_path):
    """End-to-end: CDC replay into a lake table, fold the committed
    changes through the detector, publish the feed — twice from the same
    stream — and the feed bytes must match (replay determinism through
    the WHOLE engine: stream -> merge -> changes() -> detector -> rss)."""
    from pipeline_spark.lake import LakeTable
    from pipeline_spark.streaming import replay_stream

    src = str(tmp_path / "stream")
    h = _history(spark).select(
        F.lit("U").alias("op"), "key", "cc", "ts", "value",
        F.lit(0).cast("long").alias("epoch"), F.col("event_id").alias("offset"),
    )
    h.coalesce(1).write.parquet(src)

    def run(tag):
        t = LakeTable.create(
            spark, str(tmp_path / f"t_{tag}"),
            [("event_uid", "string"), ("key", "string"), ("cc", "string"),
             ("ts", "timestamp"), ("value", "double")],
            key="event_uid", version_col="ts", n_buckets=4,
        )
        # append-only CDC: every flip event is its own key, so the lake
        # preserves full history for the detector fold
        stream_df = spark.read.parquet(src).withColumn(
            "event_uid", F.concat_ws("-", "key", F.col("offset").cast("string"))
        )
        staged = str(tmp_path / f"staged_{tag}")
        stream_df.coalesce(1).write.parquet(staged)
        replay_stream(
            spark, staged, t, checkpoint=str(tmp_path / f"ck_{tag}"),
            schema_ddl="op string, key string, cc string, ts timestamp, value double, "
                       "epoch long, offset long, event_uid string",
            extract="none",
        )
        changes = detect_changes_batch(t.read(), ["key", "cc"], tiebreak_col="event_uid")
        return publish_change_feeds(changes, str(tmp_path / f"rss_{tag}"), group_col="cc")

    a, b = run("a"), run("b")
    for pa in a:
        pb = pa.replace("rss_a", "rss_b")
        assert open(pa, "rb").read() == open(pb, "rb").read()
