"""Table I/O: schema-enforced scans and bucketed materialization.

The pipeline's inputs/outputs are plain parquet directories (the sandbox
stand-in for Iceberg tables — snapshot/append semantics live in
checkpoint.py and streaming/ingest.py). This module adds the two pieces a
100 TB deployment layers on top:

- ``read_documents``: schema-pinned scan of the interleaved span table
  (bad files fail fast instead of silently widening the schema).
- ``write_bucketed`` / ``read_table``: persist a pair/cluster table
  BUCKETED by its join key. Two tables bucketed the same way join with
  ZERO exchanges — the shuffle happens once at write time and every
  downstream join reuses the layout (verified by plan assertion in
  tests/test_io.py). At 10^12 docs this converts the per-run shuffle of
  the hottest join keys into a one-time layout cost, exactly like
  Iceberg's bucket partition transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced scan of documents(doc_id, spans)."""
    return spark.read.schema(DOCUMENTS_DDL).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) table.

    Spark bucketing requires the table catalog (saveAsTable); the files
    land under spark.sql.warehouse.dir. ``sort_cols`` additionally sorts
    within buckets so sort-merge joins skip their sort too.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
