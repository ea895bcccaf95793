"""Structured Streaming variant of the correction pipeline.

The reference is batch-only (SURVEY.md §2g), but a transcripts table at
10^12-turn scale is fed continuously; this module runs the SAME operator
graph (extraction → native detect → dispatched correction UDF) over a
``readStream`` source.  Every stage is stateless/narrow, so the stream
needs no state store; the optional windowed metrics stream uses a
watermark for late turns.

Typical wiring::

    src = spark.readStream.schema(schema).parquet(in_dir)
    q = streaming_correct(src, spark).writeStream \
        .format("parquet").option("path", out_dir) \
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import correct_pipeline


def streaming_correct(stream_df: DataFrame, spark: SparkSession, **pipeline_kwargs) -> DataFrame:
    """The batch plan applied to a streaming DataFrame.  ``order_output``
    is off (global sort is undefined on an unbounded stream — downstream
    sinks cluster by (conv_id, turn_idx) per micro-batch instead).
    ``pipeline_kwargs`` pass through to correct_pipeline — the scorer
    options (scorer_backend / scorer_table / context_bigrams) work on
    streams exactly as in batch (the correction stage is stateless)."""
    return correct_pipeline(
        stream_df, spark, order_output=False, **pipeline_kwargs
    )


def streaming_dedup(
    stream_df: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once turns from an at-least-once feed: drop replayed rows
    by key within the event-time watermark
    (``dropDuplicatesWithinWatermark`` — state for a key is held only
    until the watermark passes it, so state size is bounded by the
    watermark window's key cardinality, never by stream history; plain
    streaming dropDuplicates would keep every key forever)."""
    return stream_df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_metrics(
    corrected: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed correction metrics with late-data handling: per event-time
    window and biz, rows seen / rows corrected."""
    return (
        corrected.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("tool"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("text") != F.col("text_corrected")).cast("long")).alias(
                "n_corrected"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tool",
            "n_rows",
            "n_corrected",
        )
    )
