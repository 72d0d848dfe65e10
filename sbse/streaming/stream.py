"""Structured Streaming skin over the batch semantics.

The reference is a streaming system (NATS push-subscription, tracker
main.go:386-395), but its analytics are deterministic functions of the
event log — so batch is the primary engine and this module provides the
streaming deployment shape: file-source readStream -> decode -> watermark
(the NATS MaxAge 24h lateness bound, nats/client.go:41) -> session_window
aggregation (the 30s/5m inactivity rule) and tumbling-window rollups.

``session_window`` merges events whose gaps are <= gap — the same session
partitioning the batch lag+cumsum produces (verified in tests by comparing
session counts/bounds)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbse import GAP_MS_NORTH
from sbse.decode import decode
from sbse.tokens import TOKEN_SCHEMA_DDL


def read_token_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(TOKEN_SCHEMA_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def streaming_sessions(token_stream: DataFrame, gap_ms: int = GAP_MS_NORTH,
                       watermark: str = "24 hours") -> DataFrame:
    """Session aggregates via native session_window + watermark."""
    d = decode(token_stream, mode="expr")
    st = d.filter(F.col("ok") & F.col("key").isNotNull()).withWatermark("ts", watermark)
    gap = f"{gap_ms // 1000} seconds"
    return st.groupBy(
        "source", "key", F.session_window("ts", gap).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("started_at"),
        F.max("ts").alias("ended_at"),
        F.max("altitude").alias("max_altitude"),
    ).select(
        "source", "key", "started_at", "ended_at", "n_events", "max_altitude"
    )


def streaming_rollup_1m(token_stream: DataFrame,
                        watermark: str = "24 hours") -> DataFrame:
    d = decode(token_stream, mode="expr")
    st = d.filter(F.col("ok") & F.col("key").isNotNull()).withWatermark("ts", watermark)
    return st.groupBy(
        "source", "key", F.window("ts", "1 minute").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_tok").cast("bigint").alias("n_tok_sum"),
    ).select("source", "key", F.col("w.start").alias("bucket_start"),
             "cnt", "n_tok_sum")


def run_available_now(stream_df: DataFrame, out_path: str, ckpt: str,
                      output_mode: str = "append") -> None:
    """Drain everything currently available (batch-equivalent semantics)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
