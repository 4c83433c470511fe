"""Structured Streaming ingestion: transcripts stream → quads stream.

The reference is a batch file converter (no streaming, SURVEY.md §2.7);
this is the engine extension for continuously-landing transcript data.
The extraction plan is stateless (projection + explode + filter), so the
same compiled rules run unchanged on a streaming DataFrame; global dedup
is replaced by a watermarked ``dropDuplicates`` on the quad key within
the lateness horizon (exact global dedup across unbounded streams is
done downstream at compaction, e.g. an Iceberg MERGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..model import QUAD_COLS
from ..operators.extract import extract_quads
from ..spec.mapping import MappingSpec

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over landing parquet (swap for Kafka/Iceberg
    incremental reads in production — the downstream plan is identical)."""
    return (
        spark.readStream.schema(TRANSCRIPTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_extract_quads(
    stream: DataFrame,
    spec: MappingSpec,
    graph: str | None = None,
    watermark: str = "10 minutes",
    event_time_col: str = "ts",
) -> DataFrame:
    """Streaming extraction with within-watermark dedup.

    Keeps the event time on each quad so late data is bounded; dedup
    state is dropped beyond the watermark.
    """
    with_wm = stream.withWatermark(event_time_col, watermark)
    quads = extract_quads(with_wm, spec, graph=graph, dedup="none",
                          passthrough=[event_time_col])
    return quads.dropDuplicates(QUAD_COLS + [event_time_col])


def stream_mention_rates(
    stream: DataFrame,
    pattern: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation: mention counts per (window,
    surface form) over the transcript stream — the late-data-bounded
    monitoring view of E1."""
    with_wm = stream.withWatermark("ts", watermark)
    m = with_wm.select(
        "conv_id", "turn_idx", "ts",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(pattern), 0)
                  ).alias("mention"),
    )
    return (
        m.groupBy(F.window("ts", window).alias("w"), F.col("mention"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "mention", "n")
    )


SESSION_OUTPUT_DDL = (
    "conv_id string, n_turns bigint, n_chars bigint, "
    "first_ts timestamp, last_ts timestamp, closed boolean"
)
_SESSION_STATE_DDL = "n_turns bigint, n_chars bigint, first_us bigint, last_us bigint"


def stream_conversation_sessions(
    stream: DataFrame,
    watermark: str = "10 minutes",
    gap: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator: assemble per-conversation session
    summaries across micro-batches via ``applyInPandasWithState``.

    State per conv_id = (n_turns, n_chars, first/last event time); each
    batch emits the updated summary (``closed=false``), and an event-time
    timeout ``gap`` past the last turn emits the final ``closed=true``
    row and drops the state — the transcript-world session window. This
    is the engine's template for stateful ops the built-in operators
    can't express (the reference has no streaming at all, SURVEY §2.7).

    Arrow-batched per group; state is a single tiny tuple per live
    conversation, so memory tracks *active* conversations, not history.
    """
    import datetime

    import pandas as pd  # noqa: F811 (executor-side import)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_ms(gap)

    def assemble(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_chars, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame({
                "conv_id": [conv_id], "n_turns": [n_turns],
                "n_chars": [n_chars],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "closed": [True],
            })
            return
        n_turns, n_chars, first_us, last_us = (
            state.get if state.exists else (0, 0, None, None))
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
            ts_us = pdf["ts"].astype("int64") // 1000
            first_us = min(first_us, int(ts_us.min())) if first_us is not None else int(ts_us.min())
            last_us = max(last_us, int(ts_us.max())) if last_us is not None else int(ts_us.max())
        state.update((n_turns, n_chars, first_us, last_us))
        # a timeout earlier than the watermark is invalid — sessions whose
        # gap already elapsed close at the next watermark tick
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({
            "conv_id": [conv_id], "n_turns": [n_turns], "n_chars": [n_chars],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
            "closed": [False],
        })

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=SESSION_OUTPUT_DDL,
            stateStructType=_SESSION_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60_000,
            "minutes": 60_000, "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(n) * mult


def write_quads_stream(
    quads: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Append sink; availableNow=True drains the backlog then stops
    (used by tests; production runs continuous triggers)."""
    w = (
        quads.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
