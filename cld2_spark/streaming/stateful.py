"""Custom stateful streaming operator: per-conversation running quality
state via applyInPandasWithState.

The per-turn pipeline is stateless, but a streaming deployment wants
conversation-level signals that accumulate ACROSS micro-batches -- e.g.
"drop the whole conversation once its running keep-rate falls below a
floor" -- which needs keyed state with a timeout, not a windowed aggregate.
This module implements that operator:

    groupBy(conv_id).applyInPandasWithState(
        update_conversation_state, state = (n_turns, n_keep, last_ts))

Per micro-batch and key, the function folds the batch's per-turn keep
verdicts into the persisted counters and emits the conversation's current
rollup; state expires via an event-time timeout tied to the watermark
(GroupStateTimeout.EventTimeTimeout), so idle conversations stop occupying
the state store -- the 10^12-turn-scale requirement.

Scale notes: state per key is 3 scalars (~tens of bytes); keys are
conv_id-hash-partitioned by the shuffle that groupBy implies; skew from a
mega-conversation is bounded because each micro-batch only folds that
batch's rows (state carries the history, the group never rematerializes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n_turns", LongType()),
    StructField("n_keep", LongType()),
    StructField("last_ts", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", LongType()),
    StructField("n_keep", LongType()),
    StructField("keep_rate_pct", IntegerType()),
    StructField("conv_alive", BooleanType()),
])

MIN_CONV_KEEP_PCT = 20   # running keep-rate floor (after >= 10 turns)
MIN_TURNS_FOR_VERDICT = 10
STATE_TTL_MS = 60 * 60 * 1000  # idle conversations expire after 1h event time


def update_conversation_state(key: tuple, pdfs: Iterator[pd.DataFrame],
                              state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold one micro-batch of (conv_id, keep, ts) rows into keyed state."""
    (conv_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n_turns, n_keep, last_ts = (state.get if state.exists else (0, 0, 0.0))
    for pdf in pdfs:
        n_turns += len(pdf)
        n_keep += int(pdf["keep"].sum())
        if len(pdf):
            # normalize to ns first: pandas may deliver datetime64[us]
            # (ADVICE r2 #3 -- a raw astype('int64') would be off 1000x)
            ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
            last_ts = max(last_ts, float(ts_ns.max()) / 1e9)
    state.update((n_turns, n_keep, last_ts))
    # clamp to just past the watermark: a backfilled batch more than
    # STATE_TTL behind it would otherwise compute a timeout earlier than
    # the watermark, which Spark rejects (IllegalArgumentException)
    timeout_ms = int(last_ts * 1000) + STATE_TTL_MS
    try:
        timeout_ms = max(timeout_ms, state.getCurrentWatermarkMs() + 1)
    except Exception:
        pass  # no watermark configured (batch-mode tests)
    state.setTimeoutTimestamp(timeout_ms)
    rate = (100 * n_keep) // max(n_turns, 1)
    alive = n_turns < MIN_TURNS_FOR_VERDICT or rate >= MIN_CONV_KEEP_PCT
    yield pd.DataFrame({
        "conv_id": [conv_id], "n_turns": [n_turns], "n_keep": [n_keep],
        "keep_rate_pct": [int(rate)], "conv_alive": [alive],
    })


def start_conversation_state_stream(spark, source_dir: str, sink_dir: str,
                                    checkpoint_dir: str,
                                    watermark: str = "10 minutes",
                                    trigger_once: bool = True,
                                    max_files_per_trigger: int | None = None):
    """readStream -> per-turn pipeline -> keyed running conversation state.

    Emits one rollup row per (conversation, micro-batch) to the sink; the
    latest row per conversation is the current verdict.
    `max_files_per_trigger` forces one-file micro-batches so tests can
    drive watermark advances batch by batch.
    """
    from cld2_spark.pipeline.stages import run_pipeline
    from cld2_spark.streaming.stream import stream_transcripts

    src = stream_transcripts(spark, source_dir, watermark,
                             max_files_per_trigger)

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink_dir)

    rolled = (run_pipeline(src, passthrough=("ts",))
              .select("conv_id", "keep", "ts")
              .groupBy("conv_id")
              .applyInPandasWithState(
                  update_conversation_state,
                  outputStructType=OUTPUT_SCHEMA,
                  stateStructType=STATE_SCHEMA,
                  outputMode="append",
                  timeoutConf=GroupStateTimeout.EventTimeTimeout))
    writer = (rolled.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
