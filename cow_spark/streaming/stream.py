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
