"""Partition pruning: a hive-partitioned extracted table must prune
directories at PLAN time (PartitionFilters on the scan), not filter rows
after reading — at 100 TB a per-lang query reads one lang's files only."""

from pyspark.sql import functions as F


def test_lang_partitioned_scan_prunes(spark, tmp_path):
    p = str(tmp_path / "by_lang")
    rows = [(i, ["en", "de", "zh"][i % 3], f"text {i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.write.partitionBy("lang").parquet(p)

    q = (spark.read.parquet(p)
         .filter(F.col("lang") == "de")
         .filter(F.col("doc_id") > 10)
         .select("doc_id"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # lang reaches the scan as a PARTITION filter (directory pruning) ...
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters"):]
    assert "lang" in seg.split("]")[0]
    # ... doc_id as a pushed DATA filter (row-group pruning) ...
    assert "PushedFilters" in plan and "GreaterThan(doc_id,10)" in plan
    # ... and the read schema is pruned to the selected column
    rs = plan[plan.index("ReadSchema"):].split("\n")[0]
    assert "doc_id" in rs and "text" not in rs
    assert q.count() == sum(1 for i in range(300)
                            if i % 3 == 1 and i > 10)
