"""Structured Streaming ingestion for the entity-resolution pipeline.

The reference is batch-only (its "streaming" is re-runnable appends,
SURVEY §2.11); this module is the extension a continuously-fed 10^12-doc
table needs: as document files land, keep the name-frequency table current
and surface *first-seen* names — the incremental input to a subsequent
blocking/matching run.

Design: `readStream` over the documents directory → span extraction
(same Catalyst-native projection as batch) → ``foreachBatch`` writing
**log-structured partial counts**: each micro-batch appends its per-name
counts as parquet; readers aggregate partials (`read_name_counts`). This
avoids read-modify-write on the running table entirely — appends are
atomic, idempotent per micro-batch (checkpointed), and compaction is an
orthogonal maintenance job — the parquet stand-in for an Iceberg MERGE.

Exact-content dedup runs in the same pass: first-seen doc ids per content
hash are tracked with ``dropDuplicates`` on the streaming side (state
store), so downstream matching never sees a duplicate document twice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPANS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_documents(spark: SparkSession, source_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(SPANS_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def start_name_ingest(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Stream documents → append per-batch (name, n) partials + first-seen
    doc registry. Returns the StreamingQuery."""
    docs = stream_documents(spark, source_dir)
    # streaming-state exact dedup: only the first doc with a given content
    # hash flows on (state store keyed by hash)
    hashed = docs.withColumn("_h", F.md5(F.to_json("spans")))
    fresh = hashed.dropDuplicates(["_h"])

    counts_dir = os.path.join(table_dir, "name_counts")
    seen_dir = os.path.join(table_dir, "docs_seen")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        # idempotent under foreachBatch's at-least-once replay: each batch
        # OVERWRITES its own partition directory, so a re-run of the same
        # batch_id replaces rather than double-counts
        batch = batch.persist()
        names = (
            batch.select(F.explode("spans").alias("s"))
            .where(F.col("s.kind") == "text")
            .where(F.col("s.text").isNotNull())
            .groupBy(F.col("s.text").alias("name"))
            .agg(F.count("*").alias("n"))
            # first_seen provenance travels as DATA, not as the partition
            # id, so compaction can fold partials without losing it
            # (ADVICE r1): a fresh partial's first sighting IS this batch
            .withColumn("first_batch", F.lit(batch_id).cast("long"))
        )
        names.write.mode("overwrite").parquet(
            os.path.join(counts_dir, f"batch_id={batch_id}")
        )
        batch.select("doc_id", F.col("_h").alias("content_hash")).write.mode(
            "overwrite"
        ).parquet(os.path.join(seen_dir, f"batch_id={batch_id}"))
        batch.unpersist()

    writer = (
        fresh.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_name_counts(spark: SparkSession, table_dir: str) -> DataFrame:
    """(name, n) — aggregate of the log-structured partials."""
    partials = spark.read.parquet(os.path.join(table_dir, "name_counts"))
    return partials.groupBy("name").agg(F.sum("n").alias("n"))


def new_names_since(
    spark: SparkSession, table_dir: str, since_batch: int
) -> DataFrame:
    """Names whose FIRST partial arrived after ``since_batch`` — the
    incremental matching frontier. Uses the ``first_batch`` data column,
    which compaction preserves (min per name), so the frontier survives
    compaction (ADVICE r1)."""
    partials = spark.read.parquet(os.path.join(table_dir, "name_counts"))
    first_seen = partials.groupBy("name").agg(F.min("first_batch").alias("first_batch"))
    return first_seen.where(F.col("first_batch") > since_batch).select("name")


def compact_name_counts(spark: SparkSession, table_dir: str) -> None:
    """Maintenance: fold a snapshot of batch partitions into one compacted
    generation, then remove ONLY the snapshotted partitions — batches the
    stream appends concurrently are untouched, so compaction is safe to run
    against a live stream (the compacted generation reuses the smallest
    snapshotted batch_id, keeping ids unique). First-seen provenance is
    aggregated into the generation (min(first_batch) per name), so
    ``new_names_since`` keeps working across compactions."""
    import re
    import shutil

    counts_dir = os.path.join(table_dir, "name_counts")
    snap = [
        d
        for d in os.listdir(counts_dir)
        if re.fullmatch(r"batch_id=-?\d+", d)
    ]
    if len(snap) <= 1:
        return
    paths = [os.path.join(counts_dir, d) for d in sorted(snap)]
    gen_id = min(int(d.split("=")[1]) for d in snap)
    agg = (
        spark.read.parquet(*paths)
        .groupBy("name")
        .agg(F.sum("n").alias("n"), F.min("first_batch").alias("first_batch"))
    )
    tmp = os.path.join(table_dir, "_compacting")
    agg.write.mode("overwrite").parquet(tmp)
    for p in paths:
        shutil.rmtree(p)
    os.rename(tmp, os.path.join(counts_dir, f"batch_id={gen_id}"))


# ---------------------------------------------------------------------------
# watermarked sliding-window name frequencies (streaming twin of the batch
# events_window query) — stateful aggregation with late-data handling
# ---------------------------------------------------------------------------

SPANS_TS_DDL = SPANS_DDL + ", event_time timestamp"


def start_windowed_name_counts(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
    trigger_available_now: bool = True,
):
    """Event-time sliding-window name frequencies over the document stream.

    State lives in the Spark state store keyed by (window, name); the
    watermark bounds it — windows older than ``watermark`` behind the max
    observed event time are finalized and evicted, so state is O(active
    windows), not O(history). Update-mode foreachBatch appends each batch's
    *changed* window rows as a partial (idempotent per-batch overwrite);
    ``read_windowed_counts`` resolves latest-per-key. Killing the query and
    restarting with the same checkpoint restores offsets AND window state —
    counts straddling the restart stay exact (tests/test_streaming.py)."""
    docs = (
        spark.readStream.schema(SPANS_TS_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    names = (
        docs.select("event_time", F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "text") & F.col("s.text").isNotNull())
        .select("event_time", F.col("s.text").alias("name"))
    )
    agg = (
        names.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide), "name")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "name",
            "n",
        )
    )
    out_dir = os.path.join(table_dir, "window_counts")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    writer = (
        agg.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_windowed_counts(spark: SparkSession, table_dir: str) -> DataFrame:
    """(window_start, window_end, name, n) — latest emitted value per
    window/name across the update-mode partials."""
    from pyspark.sql import Window as W

    partials = spark.read.parquet(os.path.join(table_dir, "window_counts"))
    w = W.partitionBy("window_start", "window_end", "name").orderBy(
        F.col("batch_id").desc()
    )
    return (
        partials.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("window_start", "window_end", "name", "n")
    )
