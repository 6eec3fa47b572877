#!/usr/bin/env python
"""Domain-skew A/B: the measured case for the salted url-hash repartition.

Real crawl dumps cluster by domain (one WARC segment ≈ few hosts), so an
80%-one-domain corpus written as one-file-per-domain-bucket gives the scan a
fat partition. A: extract straight off the scan (repartition=False) — wall
clock is the fat task. B: salted repartition on xxhash64(url, salt) —
balanced tasks. Same input bytes, same UDF.

Writes BENCH/SKEW.md and prints one JSON line.
Usage: python BENCH/skew_demo.py [--docs 20000] [--cpus 16] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))


def make_domain_clustered_input(docs: int, scale: int) -> str:
    """Skewed corpus written one file per domain (the crawl-dump layout)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webextract.corpus import CORPUS_VERSION, make_corpus

    d = os.path.join(tempfile.gettempdir(),
                     f"webextract_skew_v{CORPUS_VERSION}_{docs}_{scale}")
    marker = os.path.join(d, "_DONE")
    out = os.path.join(d, "web_pages")
    if os.path.exists(marker):
        return out
    pages, _ = make_corpus(docs, seed=13, skew=True, content_scale=scale)
    os.makedirs(out, exist_ok=True)
    by_domain: dict[str, list] = {}
    for p in pages:
        dom = p["url"].split("/")[2]
        by_domain.setdefault(dom, []).append(p)
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    for i, (dom, rows) in enumerate(sorted(by_domain.items())):
        pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                       os.path.join(out, f"domain={i:02d}.parquet"),
                       row_group_size=1000)
    open(marker, "w").close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    path = make_domain_clustered_input(args.docs, args.scale)

    from pyspark.sql import functions as F

    from webextract.session import get_spark
    from webextract.sparkjob import extract_df

    spark = get_spark(app="skew-demo", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus,
                      # one partition per input file → partition boundaries
                      # follow domains, like a real per-segment crawl layout
                      extra={"spark.sql.files.maxPartitionBytes": str(1 << 40),
                             "spark.sql.files.openCostInBytes": str(1 << 30),
                             "spark.sql.adaptive.enabled": "false"})
    pages = spark.read.parquet(path)
    n = pages.count()
    dom = pages.withColumn("d", F.regexp_extract("url", r"https://([^/]+)/", 1))
    top_share = (dom.groupBy("d").count().orderBy(F.desc("count")).first()["count"]) / n

    def run(df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    t_unsalted = run(extract_df(pages, repartition=False))
    t_salted = run(extract_df(pages, num_partitions=args.cpus * 2))
    speedup = t_unsalted / t_salted

    result = {"metric": "skew_salting_speedup", "value": round(speedup, 2),
              "unit": "x", "docs": n, "hot_domain_share": round(top_share, 3),
              "cpus": args.cpus,
              "unsalted_sec": round(t_unsalted, 2), "salted_sec": round(t_salted, 2)}
    print(json.dumps(result))
    spark.stop()

    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write(f"""# BENCH/SKEW — salted repartition vs domain-clustered input

Input: {n:,} docs, {result['hot_domain_share']:.0%} of them on ONE domain,
written one-file-per-domain (the crawl-dump layout); file-split partitioning
disabled so partition boundaries follow domains — the adversarial layout the
north rule's salting targets. local[{args.cpus}], best of {args.runs} runs,
same fused extract UDF.

| plan | wall (s) |
|---|---|
| A: scan partitions as-is (fat hot-domain task) | {result['unsalted_sec']} |
| B: salted repartition on xxhash64(url, salt) | {result['salted_sec']} |

**Speedup from salting: {result['value']}x.** The shuffle pays for itself as
soon as the layout is skewed; for already-uniform inputs the engine skips it
(`extract_df(repartition=False)` — see docs/PLANS.md, zero-Exchange plan).

Reproduce: `python BENCH/skew_demo.py --docs {args.docs} --cpus {args.cpus}`
""")


if __name__ == "__main__":
    main()
