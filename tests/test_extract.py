"""Span-sequence invariant: extraction/annotation never mutates `spans`
(driver input_hint: per-row equality of kind, text, media_ref, order)."""

import os

from pyspark.sql import functions as F

from name_matching_spark.datagen import ensure_fixtures
from name_matching_spark.operators.extract import annotate_documents, extract_names


def test_extract_names_counts(spark):
    docs = spark.createDataFrame(
        [
            ("d1", [
                {"kind": "text", "text": "ACME OIL", "media_ref": None, "offset": 0},
                {"kind": "media", "text": None, "media_ref": "m://x", "offset": 1},
                {"kind": "text", "text": "ACME OIL", "media_ref": None, "offset": 2},
            ]),
            ("d2", [{"kind": "text", "text": "BOLT GAS", "media_ref": None, "offset": 0}]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = {r["name"]: r["n"] for r in extract_names(docs).collect()}
    assert out == {"ACME OIL": 2, "BOLT GAS": 1}


def test_span_sequence_preserved_through_annotation(spark):
    fx = ensure_fixtures("sf0.001")
    docs = spark.read.parquet(os.path.join(fx, "documents_spans.parquet"))
    clusters = spark.createDataFrame(
        [("whatever", "entity")], ["name", "group_name"]
    )
    annotated = annotate_documents(docs, clusters)
    # row-by-row: the spans column is byte-identical to the input
    joined = docs.alias("a").join(annotated.alias("b"), "doc_id")
    mismatches = joined.where(
        F.xxhash64(F.to_json(F.col("a.spans"))) != F.xxhash64(F.to_json(F.col("b.spans")))
    ).count()
    assert mismatches == 0
    assert annotated.count() == docs.count()
    assert "entities" in annotated.columns
