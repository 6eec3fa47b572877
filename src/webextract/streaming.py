"""Structured Streaming extension: continuous extraction over arriving crawls.

The reference is strictly batch (both orchestrators consume finite lists —
``runners/extraction/extraction_orchestrator.py:211-232``), so streaming is
an *extension point*, not parity (SURVEY.md §1.4). It exists because the
engine's one-stage design makes it free: ``mapInPandas`` works identically
under ``readStream``, so the same fused parse→clean→segment UDF serves both
modes — micro-batches of newly landed WARC-derived parquet become extracted
rows with exactly-once sink semantics via checkpointing.

Shape::

    readStream(parquet, schema pinned)         # new files = new micro-batch
      → extract_df(..., repartition=False)     # same fused UDF, no shuffle
      → writeStream(parquet, checkpoint)       # exactly-once, append-only

``trigger(availableNow=True)`` turns the same pipeline into an incremental
batch catch-up run — the streaming twin of the lineage/resume path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from .sparkjob import extract_df

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming source over a landing directory of web-pages parquet files."""
    r = (spark.readStream.schema(PAGES_SCHEMA)
         # landing areas often contain writer-job subdirectories; pick up
         # part files at any depth
         .option("recursiveFileLookup", "true"))
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def extract_stream(pages_stream: DataFrame) -> DataFrame:
    """The extraction transform, streaming-safe (stateless, no shuffle)."""
    return extract_df(pages_stream, repartition=False)


def windowed_metrics(extracted_stream: DataFrame, *, window: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Stateful branch: per-(crawl-window, status) doc counts + bytes.

    Event time is ``warc_ts`` (the crawl timestamp), so late-arriving WARC
    segments update the right window until the watermark closes it — the
    streaming analog of the batch metrics table (runner.py). Output mode
    for the sink should be ``append`` (finalized windows only).
    """
    from pyspark.sql import functions as F

    return (
        extracted_stream
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("status"))
        .agg(F.count("*").alias("docs"),
             F.sum(F.octet_length("text")).alias("bytes_extracted"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "status", "docs", "bytes_extracted")
    )


def start_metrics_stream(spark: SparkSession, input_dir: str, output_dir: str,
                         checkpoint_dir: str, *, window: str = "1 hour",
                         watermark: str = "2 hours",
                         available_now: bool = False):
    """Source → extract → watermarked windowed aggregation → parquet sink."""
    m = windowed_metrics(extract_stream(read_pages_stream(spark, input_dir)),
                         window=window, watermark=watermark)
    w = (
        m.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_extraction_stream(spark: SparkSession, input_dir: str, output_dir: str,
                            checkpoint_dir: str, *, available_now: bool = False,
                            max_files_per_trigger: int | None = None):
    """Wire source → extract → sink; returns the StreamingQuery.

    ``available_now=True`` processes everything currently in ``input_dir``
    then stops — incremental catch-up mode.
    """
    extracted = extract_stream(
        read_pages_stream(spark, input_dir, max_files_per_trigger))
    w = (
        extracted.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
