"""Watermarked windowed aggregation over the extraction stream.

Append-mode semantics under test: a window is emitted once the watermark
(derived from the previous micro-batch's max event time) passes its end —
so batch 1 emits nothing, and batch 2 (with later warc_ts) finalizes
batch 1's windows. This is the streaming twin of the batch metrics table.
"""

import os

from pyspark.sql import functions as F

from webextract.corpus import write_corpus_parquet
from webextract.streaming import start_metrics_stream


def test_windowed_metrics_finalize_on_watermark(spark, tmp_path):
    land = str(tmp_path / "landing")
    out = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)

    # one corpus; split by crawl time into an early file and a late file
    gen = str(tmp_path / "gen")
    write_corpus_parquet(gen, 2600, seed=4)
    all_pages = spark.read.parquet(f"{gen}/web_pages.parquet")
    early = all_pages.filter(F.col("warc_ts") < "2025-01-01 03:00:00")
    late = all_pages.filter(F.col("warc_ts") > "2025-01-01 09:00:00")
    n_early = early.count()
    assert n_early > 0 and late.count() > 0
    early.coalesce(1).write.parquet(f"{land}/b1.parquet")

    q = start_metrics_stream(spark, land, out, ckpt, window="1 hour",
                             watermark="30 minutes", available_now=True)
    q.awaitTermination(180)
    # batch 1: nothing finalized yet (watermark starts at epoch); the sink
    # holds only _spark_metadata, which is exactly the append-mode contract

    late.coalesce(1).write.parquet(f"{land}/b2.parquet")
    q = start_metrics_stream(spark, land, out, ckpt, window="1 hour",
                             watermark="30 minutes", available_now=True)
    q.awaitTermination(180)

    m = spark.read.parquet(out)
    early_windows = m.filter(F.col("window_start") < "2025-01-01 03:00:00")
    got = early_windows.agg(F.sum("docs")).first()[0] or 0
    # every early-file row lands in a finalized early window
    assert got == n_early, (got, n_early)
    # window bounds are aligned, hour-wide, and statuses are the engine's
    rows = early_windows.collect()
    assert rows
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 3600
        assert r.status in ("ok", "empty", "parse_error")
    # ok windows carry extracted bytes
    assert all(r.bytes_extracted > 0 for r in rows if r.status == "ok")
