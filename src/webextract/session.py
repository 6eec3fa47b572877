"""SparkSession factory with the engine's scale-minded defaults.

Local mode here is a proxy for a multi-executor cluster (the driver benches
local[8] vs local[32] as the N vs 4N cluster-size stand-in). Settings chosen
for the 100 TB target and annotated with why.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip(path: str | None = None) -> str:
    """Zip the webextract package for shipment to executors.

    This is the sandbox analog of the north rule's ``spark-submit
    --py-files webextract.zip`` deployment: executors' Python workers get the
    package on their sys.path without any installation step.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    path = path or os.path.join(tempfile.gettempdir(), "webextract_pyfiles.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for fname in sorted(os.listdir(pkg_dir)):
            if fname.endswith(".py"):
                zf.write(os.path.join(pkg_dir, fname), f"webextract/{fname}")
    return path

# HTML blobs are large (tens of KB); small Arrow batches keep Python-worker
# peak memory bounded at web scale (SURVEY.md §4.2: tune batch down ~64-256).
ARROW_BATCH_ROWS = "256"


def get_spark(app: str = "webextract", master: str | None = None,
              shuffle_partitions: int | None = None, extra: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.master(master).appName(app)
        # AQE: post-shuffle coalesce + skew-join splitting — the runtime half
        # of our explicit-partitioning story (north rule).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", ARROW_BATCH_ROWS)
        # parquet scans: 128 MiB splits is the right default for big files;
        # tiny local fixtures are coalesced by AQE anyway.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Transient-failure retry surface (reference production-patterns
        # retries/backoff, docs/guides/production-patterns.md:267-410): Spark
        # retries a failed task this many times on other executors before
        # failing the stage. Per-row *permanent* parse failures never throw —
        # they land in the DLQ (sparkjob.split_errors) and can be re-driven
        # with runner.reprocess_errors; this conf covers infra blips
        # (executor loss, OOM, shuffle fetch). local[*] keeps the default
        # behavior of failing fast only when retries are exhausted.
        .config("spark.task.maxFailures",
                os.environ.get("WEBEXTRACT_TASK_MAX_FAILURES", "4"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("WEBEXTRACT_DRIVER_MEM", "8g"))
    )
    n_shuffle = shuffle_partitions or int(os.environ.get("WEBEXTRACT_SHUFFLE", cpus))
    b = b.config("spark.sql.shuffle.partitions", str(n_shuffle))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    return spark
