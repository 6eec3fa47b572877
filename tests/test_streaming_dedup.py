"""Stateful streaming dedup (applyInPandasWithState): first occurrence of a
content fingerprint wins, within AND across micro-batches, surviving a
stream restart via the checkpointed state store."""

import os

from pyspark.sql import functions as F

from webextract.streaming import start_dedup_stream

HTML_A = (b"<html><body><p>Alpha content block with plenty of words to "
          b"extract cleanly here.</p></body></html>")
HTML_B = (b"<html><body><p>Beta content block, entirely different words "
          b"from the alpha one.</p></body></html>")
# same main content as HTML_A, different boilerplate (a recrawl/mirror):
HTML_A2 = (b"<html><body><div class=\"nav\"><a href=\"/x\">nav nav nav nav "
           b"nav nav nav</a></div><p>Alpha content block with plenty of "
           b"words to extract cleanly here.</p></body></html>")


def _write_batch(spark, land, name, rows):
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(land, name))


def test_stream_dedup_first_wins_across_batches_and_restarts(spark, tmp_path):
    from datetime import datetime

    land = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ts = datetime(2026, 1, 1)

    # batch 1: A twice (in-batch dup) + B
    _write_batch(spark, land, "b1", [
        ("u1", ts, HTML_A, "", "en"),
        ("u2", ts, HTML_A, "", "en"),
        ("u3", ts, HTML_B, "", "en"),
    ])
    q = start_dedup_stream(spark, land, out, ckpt, available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 2  # one per distinct content
    assert {r.url for r in got.collect()} == {"u1", "u3"}  # (ts,url)-min wins

    # a LATER run lands a recrawl of A (different boilerplate, same content)
    # plus genuinely new content; restart restores the seen-state
    _write_batch(spark, land, "b2", [
        ("u4", ts, HTML_A2, "", "en"),
        ("u5", ts, HTML_B, "", "en"),
        ("u6", ts, b"<html><body><p>Gamma third distinct content block "
                   b"of words.</p></body></html>", "", "en"),
    ])
    q2 = start_dedup_stream(spark, land, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out)
    assert got2.count() == 3  # only gamma added; A-recrawl and B-dup dropped
    assert {r.url for r in got2.collect()} == {"u1", "u3", "u6"}
    # distinct content keys == rows (no fingerprint emitted twice)
    assert got2.select("content_key").distinct().count() == 3
