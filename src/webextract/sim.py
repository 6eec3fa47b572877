"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

All-JVM implementations over an ``array<float>`` embedding column:

- :func:`cosine_topk`      — exact top-k vs a query vector (the baseline);
  sequential-fold dot products (``aggregate``/``zip_with``) so results are
  bit-reproducible and oracle-comparable.
- :func:`ann_topk`         — random-hyperplane LSH bucketing: probe only the
  buckets the query falls in; at 10^12 scale the bucket column is the
  partition key, so a query touches a bounded slice of the corpus.
- :func:`pairwise_near`    — all pairs above a cosine threshold with
  blocking (label or LSH bucket) to stay sub-quadratic.

The random hyperplanes are seeded deterministically (xxhash64 of
(plane, dim)) → reproducible bucketing with no stored model artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(_dot(a, a))


def _lit_vec(vec: list[float]):
    return F.array(*[F.lit(float(x)).cast("double") for x in vec])


def cosine_topk(df: DataFrame, query_vec: list[float], *, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: one scan, one top-k sort (no shuffle of vectors)."""
    scored = df.withColumn("qv", _lit_vec(query_vec)).withColumn(
        "cosine", _dot(vec_col, "qv") / (_norm(vec_col) * _norm("qv"))
    )
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplane(plane: int, dim: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane via integer hashing."""
    import random

    r = random.Random(f"{seed}|{plane}")
    return [r.gauss(0.0, 1.0) for _ in range(dim)]


def lsh_bucket_col(vec_col: str, dim: int, n_planes: int = 8, seed: int = 7):
    """Sign-of-projection bit code: bucket = Σ (dot(v, p_i) > 0) << i."""
    code = None
    for p in range(n_planes):
        plane = _hyperplane(p, dim, seed)
        proj = F.expr(
            "aggregate(zip_with({v}, array({plane}), (x, y) -> CAST(x AS DOUBLE) * y), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)".format(
                v=vec_col, plane=", ".join(f"CAST({x!r} AS DOUBLE)" for x in plane)
            )
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        code = term if code is None else code.bitwiseXOR(term)
    return code


def ann_topk(df: DataFrame, query_vec: list[float], *, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_planes: int = 8, probe_hamming: int = 1, seed: int = 7) -> DataFrame:
    """Approximate top-k: score only rows whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe).

    At scale the bucket column is precomputed and the table partitioned by
    it → the filter becomes partition pruning and the scan touches only
    probed buckets.
    """
    dim = len(query_vec)
    bucketed = df.withColumn("bucket", lsh_bucket_col(vec_col, dim, n_planes, seed))
    # query bucket, computed driver-side with the same planes
    qcode = 0
    for p in range(n_planes):
        plane = _hyperplane(p, dim, seed)
        proj = sum(float(x) * y for x, y in zip(query_vec, plane))
        qcode |= (1 if proj > 0 else 0) << p
    probe = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qcode))) <= probe_hamming
    cand = bucketed.filter(probe)
    scored = cand.withColumn("qv", _lit_vec(query_vec)).withColumn(
        "cosine", _dot(vec_col, "qv") / (_norm(vec_col) * _norm("qv"))
    )
    return (
        scored.select(id_col, "bucket", "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_near(df: DataFrame, *, tau: float, vec_col: str = "embedding",
                  id_col: str = "vec_id", block_col: str | None = None,
                  n_planes: int = 6, seed: int = 7, dim: int | None = None) -> DataFrame:
    """All pairs with cosine >= tau, joined within blocks only.

    ``block_col=None`` → LSH-bucket blocking (approximate recall, linear-ish
    cost); a user block column (e.g. label, domain) → exact within blocks.
    """
    if block_col is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        df = df.withColumn("_blk", lsh_bucket_col(vec_col, dim, n_planes, seed))
        block = "_blk"
    else:
        block = block_col
    v = df.select(
        F.col(id_col).alias("id"), F.col(block).alias("blk"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("e"),
    ).withColumn("nrm", _norm("e"))
    a = v.select(F.col("id").alias("id_a"), F.col("blk"),
                 F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("blk"),
                 F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    cos = _dot("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= tau)
        .distinct()
    )
