"""Evaluation pipeline: predictions ⋈ ground truth → per-doc metrics → rollup.

Spark translation of the reference's ``EvaluationOrchestrator``
(``runners/evaluation/evaluation_orchestrator.py:234-269``): each per-example
evaluator fan-out (:221-229) becomes one metric *column expression* in a
single projection (columnar, free); the "export once after all examples"
semantic (:268-269) is Spark's lazy terminal write. The metric set mirrors
the documented evaluators (``docs/guides/implementing-evaluation.md``):

- ``exact_match``      — field accuracy / byte identity (:115-141)
- ``len_ratio_ok``     — numeric tolerance on lengths (:148-170)
- ``similarity``       — difflib.SequenceMatcher ratio (:183-206), computed
                          in a vectorized pandas UDF (the one metric that
                          genuinely needs Python)
- ``span_count_match`` — structural agreement on extracted spans

Output is long-form ``(url, metric_name, value, description)`` — the Spark
shape of the reference's ``EvaluationResult{name, result, description}``
(``types/evaluation_result.py:11-23``) — plus a mean/min/max rollup matching
the documented CSV summary (:252-263).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

LEN_TOLERANCE = 0.02  # ±2% length tolerance for len_ratio_ok


@F.pandas_udf(T.DoubleType())
def _similarity_udf(pred: pd.Series, truth: pd.Series) -> pd.Series:
    """difflib ratio, vectorized over the Arrow batch (loop inside)."""
    import difflib

    out = []
    for p, t in zip(pred, truth):
        p = p or ""
        t = t or ""
        if p == t:
            out.append(1.0)  # fast path; dominant in a healthy pipeline
        else:
            out.append(difflib.SequenceMatcher(None, p, t).ratio())
    return pd.Series(out, dtype="float64")


ALL_METRICS = ("exact_match", "len_ratio_ok", "similarity", "span_count_match")


def per_doc_metrics(extracted: DataFrame, truth: DataFrame,
                    broadcast_truth: bool = True, *,
                    metrics: list[str] | None = None,
                    len_tolerance: float = LEN_TOLERANCE) -> DataFrame:
    """Wide per-document metric table: one row per evaluated url.

    ``metrics`` selects which metric columns are computed (default: all) and
    ``len_tolerance`` parameterizes ``len_ratio_ok`` — both map 1:1 to
    :class:`webextract.config.EvaluationConfig` (reference
    ``docs/guides/implementing-evaluation.md:148-170``: evaluators are
    selectable and tolerance-configurable per run).

    Truth/fixture sets are small next to the crawl → broadcast the join
    (no shuffle of the predictions side).
    """
    metrics = list(ALL_METRICS) if metrics is None else list(metrics)
    unknown = set(metrics) - set(ALL_METRICS)
    if unknown:
        raise ValueError(f"unknown metrics: {sorted(unknown)}; "
                         f"available: {list(ALL_METRICS)}")
    t = truth.select("url", "expected_text", "expected_spans")
    if broadcast_truth:
        t = F.broadcast(t)
    j = extracted.select("url", "text", "spans", "status").join(t, "url", "inner")
    pred_len = F.length("text")
    exp_len = F.length(F.coalesce("expected_text", F.lit("")))
    # Rows without ground truth (expected_text IS NULL — planted failures)
    # score NULL on EVERY metric, so all metrics share one denominator in the
    # rollup (a failed doc with text='' must not count similarity=1.0 while
    # silently dropping out of exact_match).
    scored = F.col("expected_text").isNotNull()

    def _m(col):
        return F.when(scored, col)

    metric_cols = {
        "exact_match": _m((F.col("text") == F.col("expected_text")).cast("double")),
        "len_ratio_ok": _m(
            F.when(exp_len == 0, (pred_len == 0).cast("double"))
             .otherwise((F.abs(pred_len - exp_len)
                         <= exp_len * F.lit(len_tolerance)).cast("double"))),
        "similarity": _m(_similarity_udf(F.col("text"), F.col("expected_text"))),
        "span_count_match": _m(
            (F.size("spans") == F.size(F.coalesce("expected_spans", F.array())))
            .cast("double")),
    }
    return j.select("url", "status",
                    *[metric_cols[name].alias(name) for name in metrics])


def _metric_descriptions(len_tolerance: float = LEN_TOLERANCE) -> dict[str, str]:
    return {
        "exact_match": "1.0 iff extracted text is byte-identical to expected_text",
        "len_ratio_ok": (f"1.0 iff |len(pred)-len(true)| <= "
                         f"{len_tolerance:.0%} of len(true)"),
        "similarity": "difflib.SequenceMatcher ratio pred vs true",
        "span_count_match": "1.0 iff predicted span count equals expected span count",
    }


def metrics_long(per_doc: DataFrame, *,
                 len_tolerance: float = LEN_TOLERANCE) -> DataFrame:
    """Melt the wide metric table to the reference's EvaluationResult shape.

    The metric set is whatever columns ``per_doc`` carries (i.e. the set
    selected in :func:`per_doc_metrics`)."""
    descriptions = _metric_descriptions(len_tolerance)
    names = [c for c in per_doc.columns if c in descriptions]
    pairs = []
    for name in names:
        pairs += [F.lit(name), F.col(name).cast("double")]
    desc = F.create_map(
        *[x for name in names for x in (F.lit(name), F.lit(descriptions[name]))]
    )
    melted = per_doc.select(
        "url",
        F.explode(F.create_map(*pairs)).alias("metric_name", "value"),
    )
    return melted.withColumn("description", desc[F.col("metric_name")])


def rollup(metrics: DataFrame) -> DataFrame:
    """Corpus summary: mean/min/max per metric (the documented CSV summary)."""
    return (
        metrics.groupBy("metric_name")
        .agg(
            F.avg("value").alias("mean_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("value").alias("n_docs"),
        )
        .orderBy("metric_name")
    )


def evaluate(extracted: DataFrame, truth: DataFrame, *,
             metrics: list[str] | None = None,
             len_tolerance: float = LEN_TOLERANCE) -> tuple[DataFrame, DataFrame]:
    """Full evaluation branch: (long-form per-doc metrics, rollup summary)."""
    wide = per_doc_metrics(extracted, truth, metrics=metrics,
                           len_tolerance=len_tolerance)
    long_df = metrics_long(wide, len_tolerance=len_tolerance)
    return long_df, rollup(long_df)
