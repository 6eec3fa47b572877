"""Resume/lineage/metrics tests (FIXTURES.md §6 checks 3-4) + evaluation."""

import pytest
from pyspark.sql import functions as F

from webextract.evaluate import evaluate, per_doc_metrics
from webextract.runner import (
    RunPaths,
    bucket_col,
    load_errors,
    load_extracted,
    load_metrics,
    run_extraction,
)

N_BUCKETS = 16


@pytest.fixture(scope="module")
def pages(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/web_pages.parquet")


def test_clean_run_metrics_invariants(spark, pages, tmp_path):
    root = str(tmp_path / "clean")
    stats = run_extraction(spark, pages, root, "run1", n_buckets=N_BUCKETS, waves=1)
    assert stats["pending"] == N_BUCKETS
    n_in = pages.count()
    n_ok = load_extracted(spark, root, "run1").count()
    n_err = load_errors(spark, root, "run1").count()
    assert n_ok + n_err == n_in
    m = load_metrics(spark, root, "run1")
    agg = m.agg(
        F.sum("docs_processed").alias("d"), F.sum("parse_failures").alias("f")
    ).first()
    assert agg.d == n_in           # FIXTURES §4 invariant
    assert agg.f == n_err


def test_rerun_is_noop(spark, pages, tmp_path):
    root = str(tmp_path / "noop")
    run_extraction(spark, pages, root, "run1", n_buckets=N_BUCKETS)
    before = load_extracted(spark, root, "run1").count()
    stats2 = run_extraction(spark, pages, root, "run1", n_buckets=N_BUCKETS)
    assert stats2["pending"] == 0 and stats2["waves"] == 0
    assert load_extracted(spark, root, "run1").count() == before


def test_resume_processes_only_pending(spark, pages, tmp_path):
    """Pre-seed lineage with half the buckets completed → only the other half
    is processed; union with a clean run of the seeded half equals a clean
    full run (FIXTURES §6.3)."""
    root = str(tmp_path / "resume")
    paths = RunPaths(root)
    seeded = list(range(0, N_BUCKETS, 2))
    spark.createDataFrame(
        [("runR", b, "completed") for b in seeded],
        "run_id string, partition_id int, status string",
    ).withColumn("completed_at", F.current_timestamp()) \
     .write.mode("overwrite").parquet(paths.lineage())

    stats = run_extraction(spark, pages, root, "runR", n_buckets=N_BUCKETS, waves=2)
    assert stats["completed_before"] == len(seeded)
    assert stats["pending"] == N_BUCKETS - len(seeded)

    out = load_extracted(spark, root, "runR")
    got_buckets = {r.partition_id for r in out.select("partition_id").distinct().collect()}
    assert got_buckets.isdisjoint(set(seeded))

    # resumed half == the corresponding subset of a clean full run
    clean_root = str(tmp_path / "resume_clean")
    run_extraction(spark, pages, clean_root, "runC", n_buckets=N_BUCKETS)
    clean = load_extracted(spark, clean_root, "runC").filter(
        ~F.col("partition_id").isin(seeded)
    )
    cols = ["url", "warc_ts", "text", "status", "partition_id"]
    assert out.select(cols).exceptAll(clean.select(cols)).count() == 0
    assert clean.select(cols).exceptAll(out.select(cols)).count() == 0


def test_waves_equal_single_shot(spark, pages, tmp_path):
    r1 = str(tmp_path / "w1")
    r4 = str(tmp_path / "w4")
    run_extraction(spark, pages, r1, "run1", n_buckets=N_BUCKETS, waves=1)
    run_extraction(spark, pages, r4, "run1", n_buckets=N_BUCKETS, waves=4)
    cols = ["url", "warc_ts", "text", "partition_id"]
    a = load_extracted(spark, r1, "run1").select(cols)
    b = load_extracted(spark, r4, "run1").select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bucket_is_data_keyed(spark, pages):
    """Same bucket for a url regardless of partitioning/cluster size."""
    a = pages.withColumn("b", bucket_col(n_buckets=N_BUCKETS)).select("url", "b")
    b = (pages.repartition(3).withColumn("b", bucket_col(n_buckets=N_BUCKETS))
         .select("url", "b"))
    assert a.exceptAll(b).count() == 0


def test_evaluation_pipeline(spark, corpus_dir, pages):
    from webextract.sparkjob import extract_df

    truth = spark.read.parquet(f"{corpus_dir}/truth.parquet")
    extracted = extract_df(pages, num_partitions=8)
    long_df, summary = evaluate(extracted, truth)
    s = {r.metric_name: r for r in summary.collect()}
    assert set(s) == {"exact_match", "len_ratio_ok", "similarity", "span_count_match"}
    # ok rows are byte-identical by construction → all metrics perfect on them
    ok_only = per_doc_metrics(extracted.filter(F.col("status") == "ok"), truth)
    agg = ok_only.agg(F.avg("exact_match").alias("em"),
                      F.avg("similarity").alias("sim"),
                      F.avg("span_count_match").alias("sc")).first()
    assert agg.em == 1.0 and agg.sim == 1.0 and agg.sc == 1.0
    # long form carries descriptions
    assert long_df.filter(F.col("description").isNull()).count() == 0


def test_eval_broadcast_plan(spark, corpus_dir, pages):
    from webextract.sparkjob import extract_df

    truth = spark.read.parquet(f"{corpus_dir}/truth.parquet")
    wide = per_doc_metrics(extract_df(pages, repartition=False), truth)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # truth side broadcast, no shuffle join
