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


DEDUP_OUT_SCHEMA = T.StructType([
    T.StructField("content_key", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])

_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType())])


def dedup_stream(extracted_stream: DataFrame, *,
                 text_col: str = "text") -> DataFrame:
    """Custom stateful operator: streaming exact-dedup across micro-batches
    (``applyInPandasWithState``).

    The streaming twin of :func:`webextract.dedup.exact_duplicates`: the
    FIRST document carrying a given normalized-content fingerprint passes,
    every later duplicate (same batch or any later micro-batch — recrawls,
    mirrors) is dropped. Grouping key is ``xxhash64(normalized text)``, so
    the shuffle carries the 8-byte key rather than the text, and the state
    per key is one long ("seen" count — kept as a count, not a bool, so the
    operator can also report duplicate multiplicity if extended).

    Within one batch the survivor is the (warc_ts, url)-minimum for
    determinism; across batches, arrival order wins (that IS the streaming
    semantic). At 10^12-doc scale run this with the RocksDB state store and
    a state TTL/timeout policy sized to the recrawl horizon; state is O(keys
    seen), 8+8 bytes each, hash-partitioned across executors.
    """
    import pandas as pd  # noqa: F401 — used by the worker-side closure
    from pyspark.sql import functions as F

    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    keyed = extracted_stream.select(
        F.xxhash64(norm).alias("content_key"),
        "url", "warc_ts", F.col(text_col).alias("text"))

    def first_only(key, pdfs, state):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        batch = [pdf for pdf in pdfs if len(pdf)]
        emit = None
        if batch:
            allb = pd.concat(batch, ignore_index=True) if len(batch) > 1 else batch[0]
            if seen == 0:
                first = allb.sort_values(["warc_ts", "url"]).iloc[[0]]
                emit = first
            seen += len(allb)
            state.update((int(seen),))
        if emit is not None:
            yield emit

    return keyed.groupBy("content_key").applyInPandasWithState(
        first_only,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def start_dedup_stream(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str, *, available_now: bool = False,
                       max_files_per_trigger: int | None = None):
    """Source → extract → stateful first-occurrence dedup → parquet sink.

    Restarting with the same checkpoint restores the seen-key state, so a
    duplicate arriving in a LATER run is still dropped (exactly-once dedup
    across the stream's whole lifetime).
    """
    extracted = extract_stream(
        read_pages_stream(spark, input_dir, max_files_per_trigger))
    deduped = dedup_stream(extracted.filter("status = 'ok'"))
    w = (
        deduped.writeStream.format("parquet")
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
