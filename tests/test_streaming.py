"""Streaming ingest: incremental name counts, first-seen dedup, frontier."""

import os

from name_matching_spark.streaming.ingest import (
    compact_name_counts,
    new_names_since,
    read_name_counts,
    start_name_ingest,
)


def _write_docs(spark, path, rows, mode="append"):
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    df.coalesce(1).write.mode(mode).parquet(path)


def _span(text):
    return {"kind": "text", "text": text, "media_ref": None, "offset": 0}


def test_incremental_ingest(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, src, [
        ("d1", [_span("ACME OIL"), _span("BOLT GAS")]),
        ("d2", [_span("ACME OIL")]),
        ("d2dup", [_span("ACME OIL")]),  # same content as d2 → deduped
    ])
    q = start_name_ingest(spark, src, table, ckpt)
    q.awaitTermination(120)
    counts = {r["name"]: r["n"] for r in read_name_counts(spark, table).collect()}
    assert counts == {"ACME OIL": 2, "BOLT GAS": 1}
    seen = spark.read.parquet(os.path.join(table, "docs_seen"))
    assert seen.count() == 2  # d2dup suppressed by content-hash state

    # second wave of files: restart with the same checkpoint → only new
    # files processed, counts accumulate, frontier exposes the new name
    max_batch = max(
        r["batch_id"] for r in spark.read.parquet(
            os.path.join(table, "name_counts")).select("batch_id").collect()
    )
    _write_docs(spark, src, [("d3", [_span("CREST LLC"), _span("ACME OIL")])])
    q2 = start_name_ingest(spark, src, table, ckpt)
    q2.awaitTermination(120)
    counts2 = {r["name"]: r["n"] for r in read_name_counts(spark, table).collect()}
    assert counts2 == {"ACME OIL": 3, "BOLT GAS": 1, "CREST LLC": 1}
    frontier = {r["name"] for r in new_names_since(spark, table, max_batch).collect()}
    assert frontier == {"CREST LLC"}

    # compaction preserves the aggregate
    compact_name_counts(spark, table)
    counts3 = {r["name"]: r["n"] for r in read_name_counts(spark, table).collect()}
    assert counts3 == counts2
