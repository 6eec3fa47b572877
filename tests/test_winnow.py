"""Winnowing fingerprints + BPE-ish token counting (webextract.analysis)."""

from pyspark.sql import functions as F

from webextract.analysis import bpeish_token_count, winnow_fingerprints

K, W = 3, 4


def test_winnow_guarantee_shared_run_shares_fp(spark):
    """The winnowing guarantee: two docs sharing a run of >= W+K-1 tokens
    share at least one fingerprint, however the run is positioned."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = W+K-1
    rows = [
        ("a", "x1 x2 x3 " + shared + " y1 y2"),
        ("b", shared + " q1 q2 q3 q4"),
        ("c", "p1 p2 p3 p4 p5 p6 p7 p8 p9"),  # no overlap
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    fps = winnow_fingerprints(df, k=K, window=W).collect()
    by = {}
    for r in fps:
        by.setdefault(r.doc_id, set()).add(r.fp)
    assert by["a"] & by["b"], "shared 6-token run must share a fingerprint"
    assert not (by["a"] & by["c"]) and not (by["b"] & by["c"])


def test_winnow_matches_python_reference(spark):
    import hashlib

    def md5h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    text = "one two three four five six seven eight nine ten"
    t = text.split()
    h = [md5h("_".join(t[i:i + K])) for i in range(len(t) - K + 1)]
    expected = {min(h[j:j + W]) for j in range(len(h) - W + 1)}
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    got = {r.fp for r in winnow_fingerprints(df, k=K, window=W,
                                             hash_fn="md5_60").collect()}
    assert got == expected


def test_winnow_short_docs_dropped(spark):
    df = spark.createDataFrame(
        [("s", "only five tokens right here"), ("e", "  ")],
        "doc_id string, text string")
    assert winnow_fingerprints(df, k=K, window=W).count() == 0


def test_bpeish_token_count(spark):
    rows = [
        ("a", "hello world"),            # 2
        ("b", "don't stop!"),            # don + ' + t + stop + ! = 5
        ("c", "v2.0-beta (x86_64)"),     # v 2 . 0 - beta ( x 86 _ 64 ) = 12
        ("d", ""),                       # 0
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.n for r in
           df.select("doc_id", bpeish_token_count("text").alias("n")).collect()}
    assert got == {"a": 2, "b": 5, "c": 12, "d": 0}


def test_quality_filter_columns_boundaries(spark):
    """The keep bit flips exactly at the integer-cross-multiplied
    boundaries (no float thresholds anywhere)."""
    from pyspark.sql import functions as F

    from webextract.analysis import quality_filter_columns

    rows = [
        ("short", "the and"),                       # 2 tokens < min 5 → drop
        ("good", "the cat and the dog sat on in"),  # passes all gates
        ("longwords", "extraordinarily " * 6 + "the and of to in"),  # mwl > 12? no — mixed; keep depends on arithmetic
        ("nostops", "zz yy xx ww vv uu tt ss"),     # 0 stopword hits → drop
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    ntok, nchar, hits, keep = quality_filter_columns("text")
    got = {r.doc_id: r for r in df.select(
        "doc_id", ntok.alias("t"), nchar.alias("c"), hits.alias("h"),
        keep.alias("k")).collect()}
    assert got["short"].k == 0
    assert got["good"].k == 1
    assert got["nostops"].k == 0
    # boundary identity: keep == all integer comparisons re-evaluated in python
    for r in got.values():
        expect = int(5 <= r.t <= 100_000 and 2 * r.t <= r.c <= 12 * r.t
                     and r.h * 50 >= r.t)
        assert r.k == expect, r
