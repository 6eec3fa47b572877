"""Seeded randomized differential tests: each relational/graph operator vs a
brute-force pure-Python reference on small random inputs.

Deliberately seeded-random rather than hypothesis: one Spark job per example
makes per-example shrinking impractical, so these run a few dense random
worlds (ties, duplicates, empty keys included by construction) and compare
EXACT results against an O(n^2)/union-find oracle.
"""

import datetime as dt
import random

from webextract.dedup import connected_components
from webextract.relops import asof_join, range_join, sessionize

T0 = dt.datetime(2024, 1, 1)


def _events(rng, n, n_keys, max_minutes):
    # duplicate-free (key, ts) per event id; ties across keys allowed
    rows = []
    for i in range(n):
        rows.append((i, rng.randrange(n_keys),
                     T0 + dt.timedelta(minutes=rng.randrange(max_minutes),
                                       microseconds=rng.randrange(1000))))
    return rows


def test_asof_join_matches_bruteforce(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        left = _events(rng, 40, 5, 300)
        right = [(100 + i, k, ts) for i, (_, k, ts) in
                 enumerate(_events(rng, 40, 5, 300))]
        ldf = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
        rdf = spark.createDataFrame(right, "event_id long, user_id long, ts timestamp")
        got = {r["event_id"]: r["asof_event_id"]
               for r in asof_join(ldf, rdf, key="user_id", left_ts="ts",
                                  right_payload=["event_id"]).collect()}
        for lid, lk, lts in left:
            cand = [(ts, i) for i, k, ts in right if k == lk and ts <= lts]
            want = max(cand)[1] if cand else None
            assert got[lid] == want, (seed, lid)


def test_range_join_matches_bruteforce(spark):
    win_us = 45 * 60_000_000
    for seed in (4, 5):
        rng = random.Random(seed)
        left = _events(rng, 35, 4, 240)
        right = [(100 + i, k, ts) for i, (_, k, ts) in
                 enumerate(_events(rng, 35, 4, 240))]
        ldf = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
        rdf = spark.createDataFrame(right, "event_id long, user_id long, ts timestamp")
        got = {(r["l_event_id"], r["r_event_id"]) for r in
               range_join(ldf, rdf, key="user_id", left_ts="ts",
                          right_ts="ts", window_us=win_us).collect()}
        want = {(li, ri) for li, lk, lts in left for ri, rk, rts in right
                if lk == rk and 0 <= (rts - lts).total_seconds() * 1e6
                <= win_us}
        assert got == want, seed


def test_sessionize_matches_bruteforce(spark):
    gap_us = 30 * 60_000_000
    for seed in (6, 7):
        rng = random.Random(seed)
        ev = _events(rng, 50, 4, 600)
        df = spark.createDataFrame(ev, "event_id long, user_id long, ts timestamp")
        got = {r["event_id"]: (r["user_id"], r["session_idx"]) for r in
               sessionize(df, gap="30 minutes").collect()}
        by_key = {}
        for i, k, ts in sorted(ev, key=lambda e: (e[1], e[2], e[0])):
            prev = by_key.get(k)
            if prev is None or (ts - prev[1]).total_seconds() * 1e6 > gap_us:
                idx = (prev[0] + 1) if prev else 1
            else:
                idx = prev[0]
            by_key[k] = (idx, ts)
            assert got[i] == (k, idx), (seed, i)


def test_connected_components_matches_union_find(spark):
    for seed in (8, 9):
        rng = random.Random(seed)
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: min(u for u in range(n) if find(u) == find(v))
                for v in range(n)}
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        v = spark.createDataFrame([(x,) for x in range(n)], "id long")
        got = {r["id"]: r["cluster_id"] for r in
               connected_components(e, vertices=v, id_col="id").collect()}
        assert got == want, seed


def test_strip_common_paragraphs_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from webextract.dedup import strip_common_paragraphs

    for seed in (5, 6):
        rng = random.Random(seed)
        # small paragraph vocabulary => real cross-doc repeats, with ties
        vocab = [f"para {i} text" for i in range(12)]
        rows = []
        for d in range(15):
            n = rng.randrange(1, 6)
            starts = sorted(rng.sample(range(0, 1000), n))
            for s in starts:
                rows.append((f"u{d:02d}", s, rng.choice(vocab)))
        max_df = 3
        # brute force
        docs_of = defaultdict(set)
        for u, _s, p in rows:
            docs_of[p].add(u)
        boiler = {p for p, us in docs_of.items() if len(us) > max_df}
        want = {}
        per_doc = defaultdict(list)
        for u, s, p in rows:
            per_doc[u].append((s, p))
        for u, ps in per_doc.items():
            kept = [(s, p) for (s, p) in sorted(ps) if p not in boiler]
            want[u] = ("\n\n".join(p for (_s, p) in kept),
                       len(kept), len(ps) - len(kept))
        df = spark.createDataFrame(rows, "url string, start long, p string")
        got = {r["url"]: (r["clean_text"], r["n_kept"], r["n_removed"])
               for r in strip_common_paragraphs(df, max_df=max_df).collect()}
        assert got == want, (seed, {u: (got[u], want[u])
                                    for u in got if got[u] != want[u]})
