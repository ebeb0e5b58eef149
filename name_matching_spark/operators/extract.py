"""Span → name extraction over the interleaved documents table.

Input shape (driver `input_hint`)::

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

Extraction is a *non-destructive projection*: we only ever `explode` a
selected copy of `spans` — the source DataFrame (and its files) are never
mutated, which is what preserves the per-row span-sequence invariant
(kind, text, media_ref, order). The reference's equivalent is reading the
name column out of the lease table (code/matching/match_leases_names.R:41-44).

All pure DataFrame ops — explode is Catalyst-native (Generate node inside
whole-stage codegen); no UDFs, no Python in this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_names(documents: DataFrame) -> DataFrame:
    """All text-span names with document frequencies: (name, n).

    ``n`` (number of spans carrying the name) plays the role of the
    reference's per-name lease count (match_leases_names.R:41-44).
    """
    return (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "text")
        .where(F.col("s.text").isNotNull())
        .groupBy(F.col("s.text").alias("name"))
        .agg(F.count("*").alias("n"))
    )


def annotate_documents(documents: DataFrame, name_clusters: DataFrame) -> DataFrame:
    """Join resolved entities back onto documents WITHOUT touching `spans`.

    ``name_clusters`` is (name, group_name). Adds an ``entities`` array
    column (sorted, distinct resolved group names per document); the original
    ``spans`` column is carried through untouched, so span-sequence equality
    holds row-by-row (tested in tests/test_extract.py).
    """
    exploded = (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "text")
        .select("doc_id", F.col("s.text").alias("name"))
    )
    doc_entities = (
        exploded.join(name_clusters, "name", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("group_name"), F.col("name")).alias("entity"),
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("entity")).alias("entities"))
    )
    return documents.join(doc_entities, "doc_id", "left")
