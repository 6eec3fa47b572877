"""Heterogeneous schema routing tests (reference heterogeneous-documents.md:
classify → per-type schema → UniversalExtractionResult, with per-row
isolation for unroutable documents)."""

import json

import pytest
from pyspark.sql import functions as F

from webextract.routing import (
    UNKNOWN_ERROR,
    UNKNOWN_TYPE,
    RouteSpec,
    SchemaRegistry,
    documents_registry,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "the customer placed an order with another customer"),
        ("d2", "a vector and a hash and a vector walk into a bar"),
        ("d3", "plain words only here"),
        ("d4", "   "),  # unroutable: blank
        ("d5", "customer found a vector"),  # matches two rules
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_route_types_and_isolation(spark, docs):
    routed = documents_registry().route(docs, text_col="text", id_col="doc_id")
    by_id = {r.doc_id: r for r in routed.collect()}
    assert by_id["d1"].doc_type == "commerce"
    assert by_id["d2"].doc_type == "ml"
    assert by_id["d3"].doc_type == "general"
    # unroutable row is isolated, not fatal: UNKNOWN + error, data null
    assert by_id["d4"].doc_type == UNKNOWN_TYPE
    assert by_id["d4"].error == UNKNOWN_ERROR
    assert by_id["d4"].data is None
    # routable rows carry no error
    assert all(by_id[d].error is None for d in ("d1", "d2", "d3", "d5"))


def test_first_matching_rule_wins(spark, docs):
    routed = documents_registry().route(docs, text_col="text", id_col="doc_id")
    assert routed.filter(F.col("doc_id") == "d5").first().doc_type == "commerce"


def test_per_type_schema_fields(spark, docs):
    routed = documents_registry().route(docs, text_col="text", id_col="doc_id")
    data = {r.doc_id: json.loads(r.data) for r in routed.collect()
            if r.data is not None}
    assert data["d1"] == {"n_customer": 2, "n_order": 1, "n_tokens": 8}
    assert data["d2"] == {"n_vector": 2, "n_hash": 1, "n_tokens": 12}
    assert data["d3"] == {"first_token": "plain", "n_tokens": 4}
    # the two schemas are genuinely different (different field sets)
    assert set(data["d1"]) != set(data["d3"])


def test_typed_roundtrip(spark, docs):
    reg = documents_registry()
    routed = reg.route(docs, text_col="text", id_col="doc_id")
    typed = reg.typed(routed, "commerce")
    rows = typed.collect()
    assert {r.doc_id for r in rows} == {"d1", "d5"}
    r = next(r for r in rows if r.doc_id == "d1")
    assert r.typed.n_customer == 2 and r.typed.n_order == 1
    # parsed struct matches the registered schema
    assert typed.schema["typed"].dataType == reg._by_type["commerce"].schema()


def test_duplicate_doc_type_raises():
    spec = RouteSpec("x", lambda t: F.length(t) > 0)
    with pytest.raises(ValueError, match="duplicate"):
        SchemaRegistry([spec, spec])


def test_route_keeps_requested_columns(spark, docs):
    routed = documents_registry().route(
        docs.withColumn("lang", F.lit("en")),
        text_col="text", id_col="doc_id", keep=["lang"])
    assert routed.columns == ["doc_id", "lang", "doc_type", "data", "error"]
