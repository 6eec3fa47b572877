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


def test_near_dup_keeps_best_copy(spark):
    # a 3-member near-dup cluster: the HIGHEST-QUALITY (longest) member must
    # survive, not the member with the smallest hash/url
    # 60 DISTINCT tokens (repetition gate must not fire) shared by all three
    base = " ".join(f"word{i:02d}tok" for i in range(60))
    rows = [
        ("http://ex.org/a", base + " phi chi psi omega extra rich tail here", "en"),
        ("http://ex.org/b", base, "en"),
        ("http://ex.org/c", base + " phi", "en"),
        ("http://ex.org/z", "totally unrelated document about maritime law "
                            "and shipping regulations in coastal waters "
                            "governing vessel traffic and port authority", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    out, report = curate(df, near_dup=True)
    kept = sorted(r["url"] for r in out.select("url").collect())
    assert "http://ex.org/z" in kept
    cluster_kept = [u for u in kept if u != "http://ex.org/z"]
    assert cluster_kept == ["http://ex.org/a"], (kept, report)
    assert report["after_near_dedup"] == 2, report
