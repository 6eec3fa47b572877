"""Resumable runs: checkpointed lineage + per-partition metrics + DLQ.

Spark translation of the reference's production patterns
(``docs/guides/production-patterns.md``): the checkpoint manager's per-doc
status store (:135-250) becomes a **lineage table** keyed
``(run_id, partition_id)``; ``get_pending_documents`` (:243-249) becomes a
left-anti join of input buckets against completed lineage; the progress
tracker (:619-686) becomes a **metrics table**; the DLQ (:480-608) an
**errors table**; idempotent export (:841-858) a deterministic
overwrite-per-wave directory layout.

Why buckets, not physical partition ids: lineage must survive re-planning.
``partition_id = pmod(xxhash64(url, salt), n_buckets)`` is a pure function of
the data, so a resumed run computes the same pending set whatever the cluster
size — this is what makes "resume at 4N executors what N executors started"
work. Salting the hash also defuses domain skew (north rule): urls from one
huge domain spread uniformly over buckets.

Durability model (100 TB story): a *wave* is the commit unit. Each wave
processes a chunk of pending buckets, overwrites its own output directory
(idempotent re-run), then appends lineage. A crash mid-wave re-runs only that
wave; completed waves are pruned by the anti-join. With Iceberg available the
same layout maps to MERGE/overwrite-by-partition commits.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .sparkjob import DEFAULT_SALT, extract_df, split_errors

LINEAGE_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType()),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("status", T.StringType()),
    T.StructField("completed_at", T.TimestampType()),
])

METRICS_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType()),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("docs_processed", T.LongType()),
    T.StructField("bytes_extracted", T.LongType()),
    T.StructField("parse_failures", T.LongType()),
])


@dataclass
class RunPaths:
    root: str

    def extracted(self, run_id: str, wave: int | None = None) -> str:
        base = os.path.join(self.root, "extracted", f"run_id={run_id}")
        return base if wave is None else os.path.join(base, f"wave={wave:05d}")

    def errors(self, run_id: str, wave: int | None = None) -> str:
        base = os.path.join(self.root, "errors", f"run_id={run_id}")
        return base if wave is None else os.path.join(base, f"wave={wave:05d}")

    def lineage(self) -> str:
        return os.path.join(self.root, "lineage")

    def metrics(self) -> str:
        return os.path.join(self.root, "metrics")


def bucket_col(salt: int = DEFAULT_SALT, n_buckets: int = 64):
    """The deterministic lineage bucket for a url."""
    return F.pmod(F.xxhash64(F.col("url"), F.lit(salt)), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, paths: RunPaths, run_id: str) -> DataFrame:
    """Lineage rows for this run (empty DF if no lineage yet)."""
    try:
        df = spark.read.schema(LINEAGE_SCHEMA).parquet(paths.lineage())
    except Exception:  # noqa: BLE001 — first run: no lineage dir yet
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return df.filter((F.col("run_id") == run_id) & (F.col("status") == "completed"))


def _manifest_path(root: str, run_id: str) -> str:
    return os.path.join(root, "runs", f"{run_id}.json")


def _load_manifest(root: str, run_id: str) -> dict | None:
    import json

    p = _manifest_path(root, run_id)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _save_manifest(root: str, run_id: str, n_buckets: int, salt: int) -> None:
    import json

    p = _manifest_path(root, run_id)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump({"run_id": run_id, "n_buckets": n_buckets, "salt": salt}, f)


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    run_id: str,
    *,
    n_buckets: int | None = None,
    waves: int = 1,
    salt: int | None = None,
    shuffle_partitions: int | None = None,
) -> dict:
    """The resumable job (reference entry point §3.3). Returns run stats.

    Plan per wave::

        scan → filter(bucket ∈ pending_wave)     # partition-pruning analog
             → repartition(bucket)                # co-locate bucket per task
             → mapInPandas(extract)               # fused stage
             → overwrite wave dir (ok) + DLQ dir  # idempotent commit
             → append lineage + metrics
    """
    # Resume safety: the bucketing (n_buckets, salt) is part of a run's
    # identity — lineage interpreted under a different bucketing would
    # silently re-process completed work. A per-run manifest pins it: a
    # resume inherits the stored values; an explicitly conflicting value
    # raises instead of corrupting the run. (Iceberg deployments would keep
    # this in a runs table.)
    manifest = _load_manifest(root, run_id)
    if manifest is not None:
        for name, given in (("n_buckets", n_buckets), ("salt", salt)):
            if given is not None and given != manifest[name]:
                raise ValueError(
                    f"run_id {run_id!r} was started with {name}="
                    f"{manifest[name]}; resuming with {name}={given} would "
                    f"corrupt lineage — pass the original value or omit it")
        n_buckets = manifest["n_buckets"]
        salt = manifest["salt"]
    else:
        n_buckets = 64 if n_buckets is None else n_buckets
        salt = DEFAULT_SALT if salt is None else salt
        _save_manifest(root, run_id, n_buckets, salt)

    paths = RunPaths(root)
    bcol = bucket_col(salt, n_buckets)
    pages_b = pages.withColumn("partition_id", bcol)

    done = completed_buckets(spark, paths, run_id)
    done_ids = sorted(r.partition_id for r in done.select("partition_id").distinct().collect())
    pending = sorted(set(range(n_buckets)) - set(done_ids))
    stats = {"run_id": run_id, "n_buckets": n_buckets,
             "completed_before": len(done_ids), "pending": len(pending), "waves": 0}
    if not pending:
        return stats

    # wave layout is deterministic given (n_buckets, waves): wave w gets every
    # waves-th pending bucket — a resumed run reconstructs identical waves.
    waves = max(1, min(waves, len(pending)))
    wave_buckets = [pending[w::waves] for w in range(waves)]

    for w, buckets in enumerate(wave_buckets):
        wave_id = buckets[0]  # stable id: first bucket in the wave
        subset = pages_b.filter(F.col("partition_id").isin(buckets))
        n_part = shuffle_partitions or max(len(buckets), 1)
        subset = subset.repartition(n_part, F.col("partition_id"))
        # the bucket flows through the UDF (no back-join): extract_batches
        # passes an input partition_id column straight to the output.
        # Extraction executes exactly ONCE per wave: all rows (ok + failed)
        # are committed in one write; the DLQ view and metrics are derived
        # from the committed files (cheap column-pruned scans), never by
        # recomputing the UDF.
        extracted = extract_df(subset, repartition=False)
        extracted.write.mode("overwrite").parquet(paths.extracted(run_id, wave_id))

        committed = spark.read.parquet(paths.extracted(run_id, wave_id))
        errs = committed.filter(F.col("status") != "ok").select(
            "url", "warc_ts", "status", "error",
            # stage-tagged DLQ (reference production-patterns.md:480-608):
            # error messages are "<stage>: <detail>" by construction
            F.split("error", ":").getItem(0).alias("stage"),
            "html_bytes", "partition_id")
        errs.write.mode("overwrite").parquet(paths.errors(run_id, wave_id))

        is_ok = F.col("status") == "ok"
        metrics = (
            committed.groupBy("partition_id")
            .agg(
                F.count("*").cast("long").alias("docs_processed"),
                F.coalesce(F.sum(F.when(is_ok, F.octet_length("text"))), F.lit(0))
                    .cast("long").alias("bytes_extracted"),
                F.count(F.when(~is_ok, 1)).cast("long").alias("parse_failures"),
            )
            .select(F.lit(run_id).alias("run_id"), "partition_id",
                    "docs_processed", "bytes_extracted", "parse_failures")
        )
        metrics.write.mode("append").parquet(paths.metrics())

        lineage = spark.createDataFrame(
            [(run_id, int(b), "completed") for b in buckets],
            "run_id string, partition_id int, status string",
        ).withColumn("completed_at", F.current_timestamp())
        lineage.write.mode("append").parquet(paths.lineage())
        stats["waves"] += 1

    return stats


def load_extracted(spark: SparkSession, root: str, run_id: str,
                   include_failures: bool = False) -> DataFrame:
    """The run's committed rows; ok rows only unless include_failures.

    (The extracted wave dirs hold every processed row — ok and failed — so
    extraction executes once; the errors dirs are a derived DLQ view.)
    """
    df = spark.read.option("recursiveFileLookup", "true").parquet(
        RunPaths(root).extracted(run_id))
    return df if include_failures else df.filter(F.col("status") == "ok")


def load_errors(spark: SparkSession, root: str, run_id: str) -> DataFrame:
    return spark.read.option("recursiveFileLookup", "true").parquet(
        RunPaths(root).errors(run_id))


def load_metrics(spark: SparkSession, root: str, run_id: str) -> DataFrame:
    df = spark.read.parquet(RunPaths(root).metrics())
    return df.filter(F.col("run_id") == run_id)
