"""JSONL source/sink for the pages table — the interchange format of most
published web-text corpus derivatives (C4/RefinedWeb-style dumps ship as
newline-delimited JSON).

JSON has no binary type, so ``html`` travels base64; the reader decodes it
back to bytes JVM-side (``unbase64`` — no Python). The schema is pinned
(never inferred): schema inference over 100 TB of JSONL is a full extra
pass, and a corrupt line must become a NULL row (PERMISSIVE +
columnNameOfCorruptRecord), not a schema change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

JSONL_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html_b64", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("_corrupt", T.StringType()),
])


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read JSONL pages (schema pinned, corrupt lines isolated not fatal)."""
    df = (spark.read.schema(JSONL_SCHEMA)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(path))
    # the filter references a real column alongside _corrupt: Spark
    # disallows queries whose referenced columns are ONLY the internal
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    return (df.filter(F.col("_corrupt").isNull() & F.col("url").isNotNull())
              .select("url", "warc_ts",
                      F.unbase64("html_b64").alias("html"), "text", "lang"))


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a pages DataFrame as JSONL (html base64-encoded)."""
    (df.select("url", "warc_ts",
               F.base64("html").alias("html_b64"), "text", "lang")
       .write.mode("overwrite").json(path))
