"""The composed curation recipe end-to-end over the synthetic corpus."""

from pyspark.sql import functions as F

from webextract.corpus import write_corpus_parquet
from webextract.pipeline import curate
from webextract.sparkjob import extract_df


def test_curate_end_to_end(spark, tmp_path):
    gen = str(tmp_path / "gen")
    write_corpus_parquet(gen, 200, seed=11)
    pages = spark.read.parquet(f"{gen}/web_pages.parquet")
    extracted = extract_df(pages, repartition=False)

    out, report = curate(extracted, lang_rates={"en": 400},
                         default_permille=1000)
    # stage flow is monotone non-increasing and every stage is reported
    keys = ["input", "after_latest_crawl", "after_gates",
            "after_exact_dedup", "after_near_dedup", "final"]
    assert list(report) == keys
    vals = [report[k] for k in keys]
    assert all(a >= b for a, b in zip(vals, vals[1:])), report
    assert report["input"] > 0 and report["final"] > 0
    # recrawls (i%50==0: same url re-crawled) resolve to the latest attempt
    assert report["after_latest_crawl"] < report["input"], report
    # output schema keeps the extracted surface; text was PII-scrubbed
    # in place (no rename)
    for c in ("url", "text", "lang"):
        assert c in out.columns
    # survivors are unique per url (recrawl resolution + dedup upstream)
    urls = [r["url"] for r in out.select("url").collect()]
    assert len(urls) == len(set(urls)) == report["final"]
