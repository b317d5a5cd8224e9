"""Streaming-path tests: file replay through the scanner pipeline,
the custom rcstream DataSource (offset tracking), watermarked windows,
stateful dedup across micro-batches, foreachBatch flaglog sink.
All offline (file sources + memory sinks)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.filters import FilterSpec
from rc_scanner_spark.schemas import CHANGE_SCHEMA
from rc_scanner_spark.sources.sse import RcChangeDataSource
from rc_scanner_spark.streaming.pipeline import (
    build_pipeline,
    read_change_stream,
    start_flaglog_sink,
    session_counts,
    windowed_counts,
)

from tests.conftest import make_change, write_changes_jsonl


@pytest.fixture()
def users(spark):
    return spark.createDataFrame([("Alice", 5)], "user string, editcount long")


@pytest.fixture()
def revisions(spark):
    rows = [(1000 + i, "spark text" if i % 2 == 0 else "nothing") for i in range(40)]
    return spark.createDataFrame(rows, "revid long, text string")


def _spec():
    return FilterSpec(
        name="stream-test",
        streamfilter={"type": ("edit",)},
        max_edits=10,
        regexes=("(?i)spark",),
        log_level=2,
    )


def test_rcstream_source_replay_and_dedup(spark, users, revisions, tmp_path):
    jsonl = str(tmp_path / "changes.jsonl")
    write_changes_jsonl(jsonl, [make_change(i, f"Page{i % 5}") for i in range(20)])
    spark.dataSource.register(RcChangeDataSource)
    changes = (
        spark.readStream.format("rcstream")
        .option("path", jsonl)
        .option("batchlines", "7")  # forces multiple micro-batches
        .load()
    )
    out = build_pipeline(changes, _spec(), users=users, revisions=revisions)
    q = (
        out.writeStream.format("memory")
        .queryName("rcstream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT title, hits FROM rcstream_out").collect()
    # titles cycle Page0..Page4; dedup state holds ACROSS micro-batches
    # -> one row per title; only even ids have matching text.
    titles = [r["title"] for r in rows]
    assert len(titles) == len(set(titles))
    assert set(titles) <= {"Page0", "Page1", "Page2", "Page3", "Page4"}
    assert all(r["hits"] == ["(?i)spark"] for r in rows)


def test_file_replay_source(spark, users, revisions, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    write_changes_jsonl(
        str(src / "batch1.json"), [make_change(i, f"T{i}") for i in range(10)]
    )
    changes = read_change_stream(spark, str(src), max_files_per_trigger=1)
    out = build_pipeline(changes, _spec(), users=users, revisions=revisions)
    q = (
        out.writeStream.format("memory")
        .queryName("replay_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n = spark.sql("SELECT count(*) AS n FROM replay_out").first()["n"]
    assert n == 5  # even ids 0,2,4,6,8 have 'spark text'


def test_windowed_counts_with_watermark(spark, tmp_path):
    # Replay the real events table as a stream; compare against the
    # batch computation of the same windows.
    sf = "/root/testdata/sf0.001"
    from rc_scanner_spark.tables import load_table

    ev_batch = load_table(spark, sf, "events")
    expected = (
        ev_batch.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    schema = ev_batch.schema
    ev_batch.write.mode("overwrite").parquet(str(tmp_path / "evstream"))
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(tmp_path / "evstream"))
    )
    agg = windowed_counts(stream, watermark="10 minutes", window_len="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) AS n FROM win_out").first()["n"]
    assert got == expected


def test_session_counts_matches_batch(spark, tmp_path):
    """Streaming F.session_window sessions equal the batch
    session_window aggregation on the same replayed events — and a
    hand fixture pins the gap semantics (events 10 min apart merge
    under a 30-min gap; a 2-hour jump opens a new session)."""
    sf = "/root/testdata/sf0.001"
    from rc_scanner_spark.tables import load_table

    ev_batch = load_table(spark, sf, "events")
    expected = (
        ev_batch.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .count()
    )
    ev_batch.write.mode("overwrite").parquet(str(tmp_path / "sessstream"))
    stream = (
        spark.readStream.schema(ev_batch.schema)
        .parquet(str(tmp_path / "sessstream"))
    )
    agg = session_counts(stream, watermark="10 minutes", gap="30 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) AS n FROM sess_out").first()["n"]
    assert got == expected
    # planted gap semantics on a hand fixture
    import datetime as _dt

    def ts(m):
        return _dt.datetime(2026, 1, 1, 0, m)

    rows = [(1, ts(0), 7, "click", 1.0, "{}"), (2, ts(10), 7, "click", 1.0, "{}"),
            (3, ts(20), 7, "click", 1.0, "{}")]
    rows.append((4, _dt.datetime(2026, 1, 1, 2, 30), 7, "click", 1.0, "{}"))
    hand = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    hand.write.mode("overwrite").parquet(str(tmp_path / "sess2"))
    stream2 = spark.readStream.schema(hand.schema).parquet(str(tmp_path / "sess2"))
    q2 = (
        session_counts(stream2, watermark="10 minutes", gap="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_hand")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    hand_rows = spark.sql(
        "SELECT n_events FROM sess_hand ORDER BY session_start"
    ).collect()
    assert [r.n_events for r in hand_rows] == [3, 1]


def test_windowed_counts_sliding_matches_batch(spark, tmp_path):
    """Hopping windows (1h width, 30m slide) through the streaming
    path equal the batch F.window(w, slide) aggregation — the
    streaming twin of queries/warehouse2.q_time_window_sliding."""
    sf = "/root/testdata/sf0.001"
    from rc_scanner_spark.tables import load_table

    ev_batch = load_table(spark, sf, "events")
    expected = {
        (r.window_start, r.event_type): r.n
        for r in (
            ev_batch.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("win"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("win.start").alias("window_start"), "event_type", "n"
            )
            .collect()
        )
    }
    schema = ev_batch.schema
    ev_batch.write.mode("overwrite").parquet(str(tmp_path / "evslide"))
    stream = spark.readStream.schema(schema).parquet(str(tmp_path / "evslide"))
    agg = windowed_counts(
        stream, watermark="10 minutes", window_len="1 hour", slide="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql(
            "SELECT window_start, event_type, n FROM slide_out"
        ).collect()
    }
    assert got == expected


def test_flaglog_sink_exactly_once_shape(spark, users, revisions, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    write_changes_jsonl(
        str(src / "b.json"), [make_change(i, f"U{i}") for i in range(6)]
    )
    changes = read_change_stream(spark, str(src))
    out = build_pipeline(changes, _spec(), users=users, revisions=revisions)
    q = start_flaglog_sink(
        out, str(tmp_path / "flaglog"), str(tmp_path / "ckpt4"), "flsink"
    )
    q.processAllAvailable()
    q.stop()
    logged = spark.read.json(str(tmp_path / "flaglog"))
    assert logged.count() == 3  # even ids 0,2,4
    assert {"filter", "title", "user", "date", "filename", "match_message"} <= set(
        logged.columns
    )


def test_rcstream_live_mode_construction():
    from rc_scanner_spark.sources.sse import ChangeStreamReader

    # live mode constructs (buffer starts empty; the feed thread backs
    # off against the unreachable endpoint)
    r = ChangeStreamReader(CHANGE_SCHEMA, {"url": "https://127.0.0.1:1/sse"})
    assert r.initialOffset() == {"line": 0}
    assert r.latestOffset() == {"line": 0}
    assert r.partitions({"line": 0}, {"line": 0})[0].rows == []
    with pytest.raises(ValueError):
        ChangeStreamReader(CHANGE_SCHEMA, {})


def test_sse_frame_parser():
    from rc_scanner_spark.sources.sse import parse_sse_events

    lines = [
        ": heartbeat comment",
        "event: message",
        'id: ["primary",{"offset":42}]',
        'data: {"title": "A",',
        'data:  "type": "edit"}',
        "",
        "data: not-json-but-still-a-frame",
        "",
    ]
    frames = list(parse_sse_events(lines))
    assert len(frames) == 2
    assert frames[0]["event"] == "message"
    assert frames[0]["id"] == '["primary",{"offset":42}]'
    # multi-line data joins with newline per the EventSource spec
    import json as _json

    obj = _json.loads(frames[0]["data"])
    assert obj == {"title": "A", "type": "edit"}
    assert frames[1]["data"] == "not-json-but-still-a-frame"
    assert frames[1]["id"] is None


def test_sse_parser_unterminated_frame_flushes():
    from rc_scanner_spark.sources.sse import parse_sse_events

    frames = list(parse_sse_events(["data: tail-no-blank-line"]))
    assert [f["data"] for f in frames] == ["tail-no-blank-line"]


def test_stateful_user_activity_across_batches(spark, tmp_path):
    from rc_scanner_spark.sources.sse import RcChangeDataSource
    from rc_scanner_spark.streaming.stateful import user_activity

    jsonl = str(tmp_path / "st.jsonl")
    # 12 events across micro-batches of 5 lines: Alice (i%3 != 0) hits
    # titles T1/T2 (2 distinct, 8 events), Bob hits T0/T1 (2 distinct,
    # 4 events).
    changes = []
    for i in range(12):
        user = "Alice" if i % 3 else "Bob"
        title = f"T{i % (3 if user == 'Alice' else 2)}"
        changes.append(make_change(i, title, user=user))
    write_changes_jsonl(jsonl, changes)

    spark.dataSource.register(RcChangeDataSource)
    stream = (
        spark.readStream.format("rcstream")
        .option("path", jsonl).option("batchlines", "5").load()
    )
    out = user_activity(stream)
    q = (
        out.writeStream.format("memory").queryName("activity")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_st"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last update per user = cumulative totals across ALL batches
    rows = spark.sql(
        "SELECT user, max(n_events) n, max(n_titles) t, max(last_offset) o "
        "FROM activity GROUP BY user"
    ).collect()
    got = {r["user"]: (r["n"], r["t"], r["o"]) for r in rows}
    assert got["Alice"] == (8, 2, 11)
    assert got["Bob"] == (4, 2, 9)


def test_stream_stream_attribution_join(spark, tmp_path):
    from rc_scanner_spark.streaming.pipeline import attribution_join
    from rc_scanner_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    clicks_b = ev.filter(F.col("event_type") == "click")
    views_b = ev.filter(F.col("event_type") == "view")
    # batch ground truth of the same interval-join condition
    expected = (
        clicks_b.alias("c")
        .join(
            views_b.alias("v"),
            F.expr(
                "c.user_id = v.user_id AND v.ts >= c.ts - INTERVAL 10 minutes"
                " AND v.ts < c.ts"
            ),
        )
        .count()
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "ss_ev"))
    stream = spark.readStream.schema(ev.schema).parquet(str(tmp_path / "ss_ev"))
    joined = attribution_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "view"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) AS n FROM attrib").first()["n"]
    assert got == expected
    assert expected > 0


@pytest.mark.slow  # certification lane
def test_stream_stream_attribution_join_outer(spark, tmp_path):
    """LEFT OUTER stream-stream: matched rows equal the inner join's
    batch ground truth; unmatched clicks (NULL view columns) appear
    once the watermark proves no view can arrive, and every one of
    them is genuinely matchless in the batch ground truth."""
    from rc_scanner_spark.streaming.pipeline import attribution_join_outer
    from rc_scanner_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    clicks_b = ev.filter(F.col("event_type") == "click")
    views_b = ev.filter(F.col("event_type") == "view")
    inner_expected = (
        clicks_b.alias("c")
        .join(
            views_b.alias("v"),
            F.expr(
                "c.user_id = v.user_id AND v.ts >= c.ts - INTERVAL 10 minutes"
                " AND v.ts < c.ts"
            ),
        )
        .count()
    )
    matchless = {
        r.event_id
        for r in clicks_b.alias("c")
        .join(
            views_b.alias("v"),
            F.expr(
                "c.user_id = v.user_id AND v.ts >= c.ts - INTERVAL 10 minutes"
                " AND v.ts < c.ts"
            ),
            "left_anti",
        )
        .select("event_id")
        .collect()
    }
    ev.write.mode("overwrite").parquet(str(tmp_path / "sso_ev"))
    stream = spark.readStream.schema(ev.schema).parquet(str(tmp_path / "sso_ev"))
    joined = attribution_join_outer(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "view"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sso"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT click_id, view_id FROM attrib_outer").collect()
    matched = [r for r in rows if r.view_id is not None]
    unmatched = [r for r in rows if r.view_id is None]
    assert len(matched) == inner_expected
    # watermark-released NULL rows: all genuinely matchless, and the
    # month-long replay leaves plenty of old matchless clicks released
    assert unmatched and all(r.click_id in matchless for r in unmatched)


def test_dedup_within_watermark_drops_in_horizon_dupes(spark, tmp_path):
    from rc_scanner_spark.streaming.pipeline import dedup_within_watermark
    from rc_scanner_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").limit(200)
    # plant exact duplicates (same event_id, same ts) — all inside any
    # watermark horizon, so every duplicate must be dropped
    doubled = ev.union(ev)
    doubled.write.mode("overwrite").parquet(str(tmp_path / "dup_ev"))
    stream = spark.readStream.schema(ev.schema).parquet(str(tmp_path / "dup_ev"))
    deduped = dedup_within_watermark(stream, ["event_id"], watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ddww"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) AS n FROM ddww").first()["n"]
    assert got == 200


def test_checkpoint_restart_is_exactly_once(spark, users, revisions, tmp_path):
    """C2 analog: the reference loses its position on connection drop
    (scanner.py:82-88); checkpointing must resume without reprocessing
    or losing events across a stop/restart."""
    src = tmp_path / "ck_in"
    src.mkdir()
    out_dir = str(tmp_path / "ck_out")
    ckpt = str(tmp_path / "ck_ckpt")

    def start():
        stream = read_change_stream(spark, str(src))
        flagged = build_pipeline(stream, _spec(), users=users, revisions=revisions)
        return start_flaglog_sink(flagged, out_dir, ckpt)

    write_changes_jsonl(
        str(src / "a.json"), [make_change(i, f"CkA{i}") for i in range(0, 6)]
    )
    q = start()
    q.processAllAvailable()
    q.stop()
    first = spark.read.json(out_dir).count()
    assert first == 3  # even revisions carry 'spark text'

    # restart from the same checkpoint with one more file present
    write_changes_jsonl(
        str(src / "b.json"), [make_change(i, f"CkB{i}") for i in range(6, 12)]
    )
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    titles = [r["title"] for r in spark.read.json(out_dir).collect()]
    # batch a NOT reprocessed, batch b fully processed
    assert len(titles) == 6, sorted(titles)
    assert len(set(titles)) == 6


def test_stateful_user_spend_evicts_and_restores(spark, tmp_path):
    """Cumulative per-user spend through the checkpointed state store,
    across BOTH micro-batches and a full query restart: phase 1 drains
    one copy of the events table, the query is stopped, a second copy
    is added, and a NEW query restarted from the same checkpoint must
    report exactly 2x the batch aggregate per user — proof the state
    was persisted on stop and restored on restart (state loss would
    read 1x; reprocessing would read 3x).

    Runs on whichever stateful API the environment supports
    (user_spend_any): transformWithStateInPandas where
    google.protobuf is importable, the applyInPandasWithState twin
    with identical semantics otherwise — so the stateful path always
    EXECUTES in CI instead of skip-gating (r11 brief #3)."""
    from rc_scanner_spark.streaming.stateful import user_spend_any
    from rc_scanner_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("user_id", "value")
    base = {
        r["user_id"]: (r["total"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    src = tmp_path / "spend_src"
    # 4 files per phase + maxFilesPerTrigger=1 -> >=4 micro-batches
    # per phase, so state evict/restore happens between batches too
    ev.repartition(4).write.mode("overwrite").parquet(str(src / "a"))

    results: list = []

    def sink(df, _epoch):
        results.extend(df.collect())

    def start():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        return (
            user_spend_any(stream, checkpoint=str(tmp_path / "ckpt_spend"))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_spend"))
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()

    ev.repartition(4).write.mode("overwrite").parquet(str(src / "b"))
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    # the API choice was pinned on first start; a mismatching marker
    # must fail fast instead of running an incompatible stateful
    # operator against the same checkpoint (ADVICE r12)
    marker = tmp_path / "ckpt_spend" / "_stateful_api"
    recorded = marker.read_text().strip()
    assert recorded in (
        "transformWithStateInPandas", "applyInPandasWithState"
    )
    marker.write_text("definitely-other-api")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    with pytest.raises(RuntimeError, match="state-store formats"):
        user_spend_any(stream, checkpoint=str(tmp_path / "ckpt_spend"))
    marker.write_text(recorded)

    last = {}
    for r in results:
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] > cur[1]:
            last[r["user_id"]] = (round(r["total_value"], 4), r["n_events"])
    expected = {
        u: (round(2 * total, 4), 2 * n) for u, (total, n) in base.items()
    }
    assert last == expected


def test_dedup_only_suppresses_flagged_titles(spark, users, tmp_path):
    """A title whose FIRST event does not match must not suppress a
    later matching event for the same title (reference filter_.py:90-102
    dedups against the flag log, i.e. against *matches* only)."""
    jsonl = str(tmp_path / "dedup_flagged.jsonl")
    # id 0: title X, revision 1000 -> non-matching text
    # id 1: title X, revision 1001 -> matching text
    # id 2: title X, revision 1002 -> matching text (true repeat, dropped)
    write_changes_jsonl(jsonl, [make_change(i, "X") for i in range(3)])
    revs = spark.createDataFrame(
        [(1000, "nothing here"), (1001, "all about spark"),
         (1002, "more spark stuff")],
        "revid long, text string",
    )
    src = tmp_path / "in_flagged"
    src.mkdir()
    os.rename(jsonl, str(src / "events.json"))
    changes = read_change_stream(spark, str(src))
    out = build_pipeline(changes, _spec(), users=users, revisions=revs)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_flagged_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_df"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT title, revision.new AS revid FROM dedup_flagged_out"
    ).collect()
    # exactly one flagged row for X, and it is a MATCHING one
    assert len(rows) == 1
    assert rows[0]["title"] == "X"
    assert rows[0]["revid"] in (1001, 1002)


class _LoopbackSSE:
    """Threaded loopback SSE server: streams `n` Change events as
    text/event-stream frames with ids, then drops the connection.
    Records the Last-Event-ID header of every request so resumption
    behavior is observable; on resume it serves only events after the
    presented id."""

    def __init__(self, n_events=10, drop_after=None, ids=True):
        import http.server
        import threading

        srv = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                last = self.headers.get("Last-Event-ID")
                srv.seen_last_ids.append(last)
                start = int(last) + 1 if last is not None else 0
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                stop = srv.n_events if srv.drop_after is None else min(
                    start + srv.drop_after, srv.n_events
                )
                for i in range(start, stop):
                    ev = make_change(i, f"Live{i}")
                    id_line = f"id: {i}\n" if srv.ids else ""
                    frame = f"{id_line}data: {json.dumps(ev)}\n\n"
                    try:
                        self.wfile.write(frame.encode())
                        self.wfile.flush()
                    except BrokenPipeError:
                        return
                # fall through: close the socket (client must reconnect)

            def log_message(self, *a):
                pass

        self.n_events = n_events
        self.drop_after = drop_after
        self.ids = ids
        self.seen_last_ids = []
        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        self._t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._t.start()

    def url(self):
        return f"http://127.0.0.1:{self.port}/sse"

    def close(self):
        self._httpd.shutdown()


def _wait_for(pred, timeout=20.0):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.1)
    return False


def test_sse_loopback_reconnect_and_resume(tmp_path):
    """Live mode against a loopback SSE server that drops the
    connection every 3 events: the feed must reconnect with
    Last-Event-ID and collect all events exactly once."""
    from rc_scanner_spark.sources.sse import _LiveFeed

    srv = _LoopbackSSE(n_events=9, drop_after=3)
    try:
        feed = _LiveFeed(srv.url(), timeout=5.0)
        assert _wait_for(lambda: feed.size() == 9), feed.size()
        ids = [r["id"] for r in feed.slice(0, 9)]
        assert ids == list(range(9))
        # reconnections presented the id of the last received event
        assert srv.seen_last_ids[0] is None
        assert "2" in srv.seen_last_ids and "5" in srv.seen_last_ids
    finally:
        srv.close()


def test_sse_double_replay_is_deduped(tmp_path):
    """Deterministic double-replay (r14 verdict item 1): a server that
    replays an overlap window on every reconnect (it rewinds 2 events
    behind the presented Last-Event-ID) must not cause duplicate
    delivery.  Without id-dedup in _LiveFeed the overlap is appended
    again, shifting every later global offset so the duplicates land
    PAST the Structured Streaming checkpoint — the VERIFY_r14
    test_sse_loopback_live_structured_streaming failure (seen=['3','3'],
    Live4/Live5 emitted twice)."""
    import http.server
    import threading

    from rc_scanner_spark.sources.sse import _LiveFeed

    n_events, overlap, drop_after = 8, 2, 4
    seen_last_ids: list[str | None] = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            last = self.headers.get("Last-Event-ID")
            seen_last_ids.append(last)
            # rewind `overlap` events behind the acknowledged id: the
            # broker-side replay window every reconnect re-serves
            start = max(int(last) + 1 - overlap, 0) if last is not None else 0
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            for i in range(start, min(start + drop_after, n_events)):
                ev = make_change(i, f"Live{i}")
                try:
                    self.wfile.write(f"id: {i}\ndata: {json.dumps(ev)}\n\n".encode())
                    self.wfile.flush()
                except BrokenPipeError:
                    return
            # close: client must reconnect (and gets the overlap again)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        feed = _LiveFeed(f"http://127.0.0.1:{httpd.server_address[1]}/sse", timeout=5.0)
        assert _wait_for(lambda: feed.size() >= n_events), (
            f"size={feed.size()}, seen={seen_last_ids}"
        )
        # exactly once, in order, despite every reconnect replaying an
        # overlap (connection 2 presents id 2 and is served 1..: events
        # 1-2 arrive again and must be dropped before the buffer)
        titles = [r["title"] for r in feed.slice(0, feed.size())]
        assert titles == [f"Live{i}" for i in range(n_events)], (
            f"{titles}, seen={seen_last_ids}"
        )
        # the server really did replay an overlap (test is armed)
        assert any(last is not None for last in seen_last_ids)
    finally:
        httpd.shutdown()


def test_sse_loopback_commit_trims_and_persists_id(tmp_path):
    """commit() bounds the driver buffer to the uncommitted window and
    persists the resumption id; a NEW feed (driver restart) presents
    the persisted id on its first request."""
    from rc_scanner_spark.schemas import CHANGE_SCHEMA as SCHEMA
    from rc_scanner_spark.sources.sse import ChangeStreamReader

    idfile = str(tmp_path / "last_id")
    srv = _LoopbackSSE(n_events=6)
    try:
        r = ChangeStreamReader(SCHEMA, {"url": srv.url(), "idfile": idfile})
        feed = r._feed
        assert _wait_for(lambda: feed.size() == 6)
        assert r.latestOffset() == {"line": 6}
        parts = r.partitions({"line": 0}, {"line": 6})
        rows = [row for p in parts for row in p.rows]
        assert len(rows) == 6
        r.commit({"line": 4})
        # committed prefix trimmed, uncommitted window intact
        assert feed.slice(0, 6) == feed.slice(4, 6)
        assert len(feed.slice(4, 6)) == 2
        assert feed.size() == 6  # global offset unchanged by trim
        with open(idfile) as f:
            # id of the last COMMITTED event (offset 3) — NOT the last
            # received one (5): resuming from the received id would
            # skip the uncommitted events 4-5 forever on restart —
            # plus the committed global offset (4) for restart
            # alignment.
            assert f.read() == "3\n4"
    finally:
        srv.close()

    # restart: fresh server, fresh reader -> resumes from the last
    # COMMITTED id, so the server replays the uncommitted tail (4, 5)
    srv2 = _LoopbackSSE(n_events=6)
    try:
        r2 = ChangeStreamReader(SCHEMA, {"url": srv2.url(), "idfile": idfile})
        assert _wait_for(lambda: len(srv2.seen_last_ids) > 0)
        assert srv2.seen_last_ids[0] == "3"
        # replayed events must ALIGN to the checkpoint offset, not be
        # cleared: the idfile's persisted offset restores _base=4
        # directly, so the buffered replay maps to global offsets 4..
        # before any partitions() call (latestOffset never regresses).
        assert r2._feed._base == 4 and r2._feed._aligned
        r2.partitions({"line": 4}, {"line": 4})
        assert _wait_for(lambda: r2._feed.size() >= 5)
        replay = r2._feed.slice(4, 6)
        assert len(replay) >= 1  # the recovered uncommitted events
    finally:
        srv2.close()


def test_sse_idless_stream_persists_offset(tmp_path):
    """On a stream whose events carry NO ids, trim() must still
    persist the committed global offset (empty id line + base) so a
    restart restores _base instead of falling back to the
    clear-and-skip alignment path (ADVICE r11: the idfile went
    permanently stale while _base advanced in memory)."""
    from rc_scanner_spark.schemas import CHANGE_SCHEMA as SCHEMA
    from rc_scanner_spark.sources.sse import ChangeStreamReader

    idfile = str(tmp_path / "last_id")
    srv = _LoopbackSSE(n_events=6, ids=False)
    try:
        r = ChangeStreamReader(SCHEMA, {"url": srv.url(), "idfile": idfile})
        feed = r._feed
        # >= not ==: with no Last-Event-ID to present, every ~1 s
        # reconnect replays all 6 events and the buffer keeps growing
        # — an exact-size assert is a <1 s race (review r12).  The
        # committed offset below is invariant to the growth.
        assert _wait_for(lambda: feed.size() >= 6)
        r.commit({"line": 4})
        assert feed.size() >= 6  # trim drops only the committed prefix
        with open(idfile) as f:
            # no event id to persist -> empty first line, but the
            # committed global offset is still written
            assert f.read() == "\n4"
    finally:
        srv.close()

    # restart: _base restored from the offset line, no Last-Event-ID
    # presented (nothing to replay on an id-less stream), and
    # latestOffset never regresses below the checkpointed 4
    srv2 = _LoopbackSSE(n_events=6, ids=False)
    try:
        r2 = ChangeStreamReader(SCHEMA, {"url": srv2.url(), "idfile": idfile})
        assert r2._feed._base == 4 and r2._feed._aligned
        assert not r2._feed._resumed
        assert _wait_for(lambda: len(srv2.seen_last_ids) > 0)
        assert srv2.seen_last_ids[0] is None
        assert r2.latestOffset()["line"] >= 4
    finally:
        srv2.close()


def test_sse_trim_keeps_last_known_id_for_idless_tail(tmp_path):
    """Mixed-stream guard (ADVICE r12): when the last COMMITTED event
    carries no SSE id, trim() must persist the newest KNOWN committed
    id — here the one restored from the idfile — not overwrite it
    with an empty line, or a later restart loses the downtime-gap
    replay the persisted id enabled.  Exercised directly on the feed
    buffer (the background thread points at a dead port and just
    retries)."""
    from rc_scanner_spark.sources.sse import _LiveFeed

    idfile = str(tmp_path / "last_id")
    with open(idfile, "w", encoding="utf-8") as f:
        f.write("ev-41\n4")  # prior run: committed id ev-41 at offset 4

    feed = _LiveFeed("http://127.0.0.1:9/dead", timeout=0.2, idfile=idfile)
    assert feed._base == 4 and feed._last_committed_id == "ev-41"
    with feed._lock:
        # two id-less events arriving before any id-carrying one on
        # this connection; _last_recv_id was restored, but simulate a
        # buffer whose stored per-event ids are None (id-less head)
        feed._events.append(({"title": "A"}, None))
        feed._events.append(({"title": "B"}, None))
    feed.trim(6)  # commit both id-less events
    with open(idfile, encoding="utf-8") as f:
        # offset advances, the good id survives
        assert f.read() == "ev-41\n6"

    with feed._lock:
        feed._events.append(({"title": "C"}, "ev-77"))
    feed.trim(7)  # an id-carrying commit updates the persisted id
    with open(idfile, encoding="utf-8") as f:
        assert f.read() == "ev-77\n7"


def test_sse_loopback_live_structured_streaming(spark, tmp_path):
    """The FULL live path under Structured Streaming: readStream
    format("rcstream") with a url option against a loopback SSE server
    that drops the connection every 2 events, JSON file sink (the only
    built-in sink with checkpoint recovery), checkpoint.  Phase 1
    collects all 6 events exactly once (reconnect + Last-Event-ID
    resume inside a running query); phase 2 restarts the query from
    the checkpoint against a FRESH server holding 8 events and must
    append exactly the 2 new ones (idfile id+offset resumption
    end-to-end)."""
    spark.dataSource.register(RcChangeDataSource)
    idfile = str(tmp_path / "last_id")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def out_titles():
        try:
            return sorted(
                r.title
                for r in spark.read.schema(CHANGE_SCHEMA).json(out).collect()
            )
        except Exception:
            return []

    srv = _LoopbackSSE(n_events=6, drop_after=2)
    try:
        df = (
            spark.readStream.format("rcstream")
            .option("url", srv.url())
            .option("idfile", idfile)
            .load()
        )
        q = (
            df.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        # generous bound: only the FAILURE path pays it; a loaded host
        # starves microbatch scheduling well past a minute.  >= not ==
        # so an overshoot (duplicates) fails FAST at the equality
        # assert below with the actual titles, instead of spinning the
        # full timeout (intermittent full-suite flake, round 12 — the
        # messages exist to identify the failing condition next time).
        assert _wait_for(
            lambda: len(out_titles()) >= 6, timeout=180.0
        ), f"phase1 timeout: titles={out_titles()}"
        q.processAllAvailable()
        q.stop()
    finally:
        srv.close()
    got1 = out_titles()
    assert got1 == [f"Live{i}" for i in range(6)], f"phase1: {got1}"

    # phase 2: driver restart -- fresh server with 2 extra events; the
    # restarted query resumes from the checkpointed offset and the
    # idfile Last-Event-ID, so only Live6 and Live7 are appended.
    srv2 = _LoopbackSSE(n_events=8)
    try:
        df2 = (
            spark.readStream.format("rcstream")
            .option("url", srv2.url())
            .option("idfile", idfile)
            .load()
        )
        q2 = (
            df2.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        assert _wait_for(
            lambda: len(out_titles()) >= 8, timeout=180.0
        ), f"phase2 timeout: titles={out_titles()}, seen={srv2.seen_last_ids}"
        q2.processAllAvailable()
        q2.stop()
    finally:
        srv2.close()
    got2 = out_titles()
    # no dupes, no gaps
    assert got2 == [f"Live{i}" for i in range(8)], (
        f"phase2: {got2}, seen={srv2.seen_last_ids}"
    )
