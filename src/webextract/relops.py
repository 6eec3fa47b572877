"""Relational operators Spark's DataFrame API lacks as primitives, built as
compositions of built-in ops (no Python in the hot path): gap-based
sessionization and the as-of (nearest-earlier) join.

Both follow the same scale discipline as the rest of the engine: ONE shuffle
keyed on the entity id, sort within the partition, window functions do the
rest — never a per-row subquery, never a range cross-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _us(c: Column) -> Column:
    """Microseconds since epoch; accepts TIMESTAMP and TIMESTAMP_NTZ (the
    parquet default). Only DIFFERENCES of this value are ever used, so the
    NTZ->LTZ session-zone offset cancels (and the session zone is pinned to
    UTC in session.get_spark anyway)."""
    return F.unix_micros(c.cast("timestamp_ltz"))


def sessionize(df: DataFrame, *, key: str = "user_id", ts: str = "ts",
               order_tiebreak: str = "event_id",
               gap: str = "4 hours") -> DataFrame:
    """Assign gap-based session indexes: a new session starts when the time
    since the entity's previous event exceeds ``gap``.

    The classic two-window composition: lag() marks session starts, a
    running sum() numbers them. Both windows share the same
    (partition key, order) so Spark plans ONE exchange + ONE sort and
    evaluates both window functions in a single Window node. Microsecond
    arithmetic keeps the boundary exact in any engine.

    Returns the input plus ``session_idx`` (1-based per entity).
    """
    gap_us = _duration_us(gap)
    w = W.partitionBy(key).orderBy(ts, order_tiebreak)
    prev = F.lag(ts).over(w)
    new_s = F.when(
        prev.isNull()
        | (_us(F.col(ts)) - _us(prev) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        "session_idx",
        F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))


def _duration_us(s: str) -> int:
    """Parse a duration string to microseconds — one parser for the whole
    engine (streaming TTLs and session gaps accept the same vocabulary)."""
    from .streaming import _duration_ms

    return _duration_ms(s) * 1000


def asof_join(left: DataFrame, right: DataFrame, *, key: str,
              left_ts: str, right_ts: str | None = None,
              right_payload: list[str] | None = None,
              tolerance_us: int | None = None) -> DataFrame:
    """As-of join: for every left row, the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``key`` (NULLs when none) —
    point-in-time feature lookup / "state as of the event" semantics.

    Spark has no ASOF primitive; the naive formulations are a range
    theta-join (quadratic per key) or a per-row subquery. This is the
    union-tag linearization instead: tag both inputs, union them, and take
    ``last_value(payload, ignorenulls)`` over (key ORDER BY ts, tag) — right
    rows sort BEFORE left rows at equal ts, so "at-or-before" includes
    same-instant matches, matching DuckDB's ``ASOF JOIN ... ON l.ts >=
    r.ts`` (q43's oracle). Cost: ONE shuffle of |L|+|R| rows keyed on
    ``key`` + one sort — the same plan shape Flink uses for temporal joins.

    ``right_payload`` columns come back prefixed ``asof_``;
    ``tolerance_us`` voids matches older than the window.

    The carried payload is ONE struct per right row, not per-column
    last() calls: ``last(col, ignorenulls)`` per column would skip a NULL
    field of the true matched row and back-fill it from an OLDER right row,
    stitching values from different rows. The struct is non-null whenever a
    right row exists, so ``last(struct, ignorenulls)`` selects the matched
    ROW atomically, NULL fields included — same semantics as the oracle's
    native ASOF join.
    """
    right_ts = right_ts or left_ts
    payload = right_payload or [c for c in right.columns
                                if c not in (key, right_ts)]
    lt = left.withColumn("_tag", F.lit(1))
    rt = right.select(
        F.col(key), F.lit(0).alias("_tag"),
        F.struct(F.col(right_ts).alias("_asof_ts"),
                 *[F.col(c).alias(f"asof_{c}") for c in payload])
         .alias("_p"))
    rt = rt.withColumn("_ats", F.col("_p._asof_ts"))
    lt = lt.withColumn("_ats", F.col(left_ts))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (W.partitionBy(key).orderBy("_ats", "_tag")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = F.last("_p", ignorenulls=True).over(w)
    out = u.select(
        *[c for c in left.columns], "_tag",
        matched.getField("_asof_ts").alias("_asof_ts"),
        *[matched.getField(f"asof_{c}").alias(f"asof_{c}") for c in payload],
    ).filter(F.col("_tag") == 1).drop("_tag")
    if tolerance_us is not None:
        lag = _us(F.col(left_ts)) - _us(F.col("_asof_ts"))
        stale = F.col("_asof_ts").isNull() | (lag > tolerance_us)
        keep_cols = [c for c in out.columns if not c.startswith("_")]
        out = out.select(
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
              if c.startswith("asof_") else F.col(c) for c in keep_cols],
            F.when(stale, F.lit(None)).otherwise(F.col("_asof_ts"))
             .alias("_asof_ts"))
    return out.withColumnRenamed("_asof_ts", "asof_ts")


def range_join(left: DataFrame, right: DataFrame, *, key: str,
               left_ts: str, right_ts: str,
               window_us: int) -> DataFrame:
    """Banded range join: all (left, right) pairs with the same ``key`` and
    ``right_ts`` in ``[left_ts, left_ts + window_us]`` — "purchase within an
    hour of the click" joins.

    The naive formulation is an equi-join on ``key`` with a range residual:
    the join itself materializes |L_k| x |R_k| pairs per key before
    filtering — quadratic in the per-key event count. This is the banding
    decomposition instead: bucket both sides by ``floor(ts / window)``; a
    left row in bucket b can only match right buckets b and b+1, so the
    left side is exploded to its two candidate buckets and the join is a
    pure EQUI-join on (key, bucket) + the exact range filter. Each right
    row lives in exactly one bucket, so no dedup is needed. Cost is linear
    in true matches + band co-occupancy — the standard interval-join plan
    of streaming engines (Flink interval joins band the state the same
    way), and it shuffles both sides ONCE on (key, bucket).

    Left columns come back prefixed ``l_``, right columns ``r_``.
    """
    # integer division, not double: epoch-us values near/above 2^53 lose
    # ulps in a double quotient and can land an edge row in bucket b+2,
    # silently dropping a true match; `div` on longs is exact at any epoch
    lt = left.select(
        F.col(key).alias("_k"), _us(F.col(left_ts)).alias("_lus"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns])
    lt = lt.withColumn("_b0", F.expr(f"_lus div {window_us}"))
    lt = lt.select("*", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1))
                   .alias("_b")).drop("_b0")
    rt = right.select(
        F.col(key).alias("_k"), _us(F.col(right_ts)).alias("_rus"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns])
    rt = rt.withColumn("_b", F.expr(f"_rus div {window_us}"))
    gap = F.col("_rus") - F.col("_lus")
    return (lt.join(rt, ["_k", "_b"])
              .filter((gap >= 0) & (gap <= window_us))
              .drop("_k", "_b", "_lus", "_rus"))


def salted_join(left: DataFrame, right: DataFrame, *, key: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Hot-key (skew) equi-join: salt the heavy left side, REPLICATE the
    light right side once per salt value, join on (key, salt).

    A plain equi-join sends every row of a hot key to ONE reducer; salting
    spreads the hot key's rows over ``salt`` reducers while the right side
    (dimension/lookup — small per key, not necessarily small in total)
    is replicated ``salt``x, which is the explicit trade: use when the
    left is orders of magnitude heavier per hot key than the right. The
    result is EXACTLY the plain join's (q53's oracle proves it) — salting
    is plan surgery, not a semantics change. AQE's skew-join split is the
    automatic alternative when its size stats see the skew; this is the
    deterministic one for when you know the key distribution (domain-
    clustered crawls — the same defense sparkjob's salted repartition
    applies to extraction).
    """
    # normalize ("full_outer" → "fullouter") and reject EXPLICITLY: bare
    # "outer" is Spark's alias for FULL outer, and the old suffix-stripping
    # check let it through (unmatched right rows would emit once per salt)
    if how.lower().replace("_", "") in (
            "outer", "full", "fullouter", "right", "rightouter"):
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer are not salt-"
            "invariant — an unmatched right row would surface once per salt "
            "value. Use the plain join for those, or swap the sides.")
    sl = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)))
    sr = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"),
                                      F.lit(salt - 1).cast("long"))))
    return sl.join(sr, [key, "_salt"], how).drop("_salt")
