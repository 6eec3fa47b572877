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


def per_doc_metrics(extracted: DataFrame, truth: DataFrame,
                    broadcast_truth: bool = True) -> DataFrame:
    """Wide per-document metric table: one row per evaluated url.

    Truth/fixture sets are small next to the crawl → broadcast the join
    (no shuffle of the predictions side).
    """
    t = truth.select("url", "expected_text", "expected_spans")
    if broadcast_truth:
        t = F.broadcast(t)
    j = extracted.select("url", "text", "spans", "status").join(t, "url", "inner")
    pred_len = F.length("text")
    exp_len = F.length(F.coalesce("expected_text", F.lit("")))
    return j.select(
        "url",
        "status",
        (F.col("text") == F.col("expected_text")).cast("double").alias("exact_match"),
        F.when(exp_len == 0, (pred_len == 0).cast("double"))
         .otherwise(
            (F.abs(pred_len - exp_len) <= exp_len * LEN_TOLERANCE).cast("double")
        ).alias("len_ratio_ok"),
        _similarity_udf(F.col("text"), F.col("expected_text")).alias("similarity"),
        (F.size("spans") == F.size(F.coalesce("expected_spans", F.array())))
            .cast("double").alias("span_count_match"),
    )


_METRIC_DESCRIPTIONS = {
    "exact_match": "1.0 iff extracted text is byte-identical to expected_text",
    "len_ratio_ok": f"1.0 iff |len(pred)-len(true)| <= {LEN_TOLERANCE:.0%} of len(true)",
    "similarity": "difflib.SequenceMatcher ratio pred vs true",
    "span_count_match": "1.0 iff predicted span count equals expected span count",
}


def metrics_long(per_doc: DataFrame) -> DataFrame:
    """Melt the wide metric table to the reference's EvaluationResult shape."""
    pairs = []
    for name in _METRIC_DESCRIPTIONS:
        pairs += [F.lit(name), F.col(name).cast("double")]
    desc = F.create_map(
        *[x for name, d in _METRIC_DESCRIPTIONS.items() for x in (F.lit(name), F.lit(d))]
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


def evaluate(extracted: DataFrame, truth: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full evaluation branch: (long-form per-doc metrics, rollup summary)."""
    wide = per_doc_metrics(extracted, truth)
    long_df = metrics_long(wide)
    return long_df, rollup(long_df)
