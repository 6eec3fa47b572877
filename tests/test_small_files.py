"""Scan-level small-file coalescing — the north rule's "adaptive coalesce
of small HTML files", evidenced at the mechanism level.

Spark's parquet/Iceberg scan packs many tiny files into few tasks at
planning time (FilePartition first-fit packing): the split target is
``min(maxPartitionBytes, max(openCostInBytes, totalBytes/defaultParallelism))``
and every file is billed ``max(size, openCostInBytes)``, so a directory of
thousands of page-sized files never becomes thousands of tasks.  This is
adaptive in the input — the same session config yields 1 task for 1 big
file and ~bytes/target tasks for shredded layouts — and it composes with
``tableio.compact_parquet`` (the storage-side fix, q59) and with AQE's
post-shuffle coalesce (the shuffle-side fix, ``session.py``).

Reference anchor: document-extraction-tools reads one file per work item
(``base/reader/base_reader.py``); per-file task granularity is exactly what
a 10^12-doc corpus cannot afford, so the Spark-native answer is scan-time
packing rather than a per-file orchestrator loop.
"""

import glob

import pytest


@pytest.fixture(scope="module")
def shredded(spark, corpus_dir, tmp_path_factory):
    """The 600-doc corpus rewritten as 64 tiny parquet files."""
    d = str(tmp_path_factory.mktemp("shredded") / "web_pages.parquet")
    (spark.read.parquet(corpus_dir + "/web_pages.parquet")
     .repartition(64).write.mode("overwrite").parquet(d))
    return d


def test_scan_packs_small_files(spark, shredded):
    files = glob.glob(shredded + "/part-*.parquet")
    assert len(files) >= 32, "fixture must actually be a small-file layout"
    n_parts = spark.read.parquet(shredded).rdd.getNumPartitions()
    # 64 page-sized files × 4 MiB open-cost ≈ 256 MiB billed, packed into
    # ~4–8 splits on local[4]; the invariant that matters at scale is
    # "task count tracks bytes, not file count".
    assert n_parts < len(files) / 2
    assert n_parts <= 16


def test_extraction_identical_across_layouts(spark, corpus_dir, shredded):
    from webextract.sparkjob import extract_df

    def run(path):
        rows = (extract_df(spark.read.parquet(path), repartition=False)
                .select("url", "text", "error").collect())
        return sorted((r.url, r.text, r.error) for r in rows)

    assert run(corpus_dir + "/web_pages.parquet") == run(shredded)
