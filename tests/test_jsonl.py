"""JSONL pages roundtrip: bytes survive base64, corrupt lines isolate."""

from pyspark.sql import functions as F

from webextract.corpus import write_corpus_parquet
from webextract.jsonl import read_jsonl, write_jsonl


def test_jsonl_roundtrip_and_corrupt_isolation(spark, tmp_path):
    gen = str(tmp_path / "gen")
    write_corpus_parquet(gen, 100, seed=13)
    pages = spark.read.parquet(f"{gen}/web_pages.parquet")
    out = str(tmp_path / "jl")
    write_jsonl(pages, out)

    # plant a corrupt line as its own file (appending to a part file would
    # break the Hadoop local-FS .crc sidecar, a different failure)
    with open(f"{out}/zz-extra.json", "w") as f:
        f.write('{"url": "broken", BAD JSON\n')

    back = read_jsonl(spark, out)
    assert back.count() == pages.count()  # corrupt line dropped, not fatal
    # binary html survives the base64 roundtrip byte-for-byte
    diff = (back.alias("b").join(pages.alias("p"),
                                 ["url", "warc_ts"])
            .filter(F.col("b.html") != F.col("p.html")).count())
    assert diff == 0
