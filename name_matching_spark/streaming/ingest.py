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

Exact-content dedup runs in the same pass, backed by the on-disk
``docs_seen`` registry rather than streaming ``dropDuplicates`` state: a
state-store entry per distinct document EVER seen would grow without
bound at the 10^12-doc design point (no watermark can bound exact
dedup), while the disk registry scales like any other table — each batch
dedups within itself and anti-joins the registry of PRIOR batches, so
downstream matching never sees a duplicate document twice and executor
state stays empty.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BATCH_RE = re.compile(r"batch_id=(-?\d+)$")
_CGEN_RE = re.compile(r"gen=(-?\d+)$")

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
    hashed = docs.withColumn("_h", F.md5(F.to_json("spans")))

    counts_dir = os.path.join(table_dir, "name_counts")
    seen_dir = os.path.join(table_dir, "docs_seen")

    def _sink(incoming: DataFrame, batch_id: int) -> None:
        # idempotent under foreachBatch's at-least-once replay: each batch
        # OVERWRITES its own partition directory, so a re-run of the same
        # batch_id replaces rather than double-counts.
        #
        # exact-content dedup, DISK-backed (module docstring): dedup within
        # the batch, then anti-join the docs_seen registry of PRIOR batches
        # — the current batch's own registry dir is excluded so a replayed
        # batch does not anti-join against its previous attempt and write
        # itself away to an empty partial.
        batch = incoming.dropDuplicates(["_h"])
        prior = [
            p
            for p in _live_paths(seen_dir)
            if not p.endswith(f"batch_id={batch_id}")
        ]
        if prior:
            seen = spark.read.parquet(*prior).select(
                F.col("content_hash").alias("_h")
            )
            batch = batch.join(seen, "_h", "left_anti")
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
        hashed.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _scan_log_dir(log_dir: str) -> tuple[dict[int, str], dict[int, str]]:
    """(batch partials by id, compacted generations by watermark) under a
    log-structured table directory."""
    batches: dict[int, str] = {}
    gens: dict[int, str] = {}
    for d in os.listdir(log_dir) if os.path.isdir(log_dir) else []:
        m = _BATCH_RE.fullmatch(d)
        if m:
            batches[int(m.group(1))] = d
            continue
        m = _CGEN_RE.fullmatch(d)
        if m:
            gens[int(m.group(1))] = d
    return batches, gens


def _live_paths(log_dir: str) -> list[str]:
    """The directories a consistent read covers: the LATEST compacted
    generation (``gen=<W>``, which folds every batch id ≤ W) plus the
    batch partials with id > W. Batch dirs at or below the generation
    watermark are superseded garbage (a crash may leave them behind;
    the next compaction collects them) and are never read — that is what
    makes the compaction commit atomic for readers."""
    batches, gens = _scan_log_dir(log_dir)
    w = max(gens) if gens else None
    paths = [os.path.join(log_dir, gens[w])] if w is not None else []
    paths += [
        os.path.join(log_dir, d)
        for b, d in sorted(batches.items())
        if w is None or b > w
    ]
    return paths


def _compact_log_dir(spark: SparkSession, log_dir: str, fold_agg) -> None:
    """Shared compaction machinery (see ``compact_name_counts`` for the
    atomicity/replay argument): fold the current generation + all durable
    batch partials (never the highest id — possibly an uncommitted
    in-flight write that a restarted stream will REPLAY) into a new
    ``gen=<W>`` committed by one atomic rename. ``fold_agg(df) -> df``
    collapses the unioned partials.

    Superseded dirs are NOT swept here — they are collected by the NEXT
    compaction run (the garbage-collection step below). The one-cycle lag
    is what makes compaction safe against concurrent readers: a reader
    (including the live ingest sink's anti-join) lists ``_live_paths``
    once and reads those directories lazily during its job; an immediate
    post-commit sweep would delete files out from under any read that was
    in flight across the commit. Deferring the sweep one compaction cycle
    gives every in-flight read a full cycle of grace, at the cost of one
    generation of garbage on disk between runs. (Readers never LIST the
    superseded dirs — ``_live_paths`` takes the latest generation plus
    newer partials only — so correctness never depends on the sweep.)"""
    if not os.path.isdir(log_dir):
        return
    batches, gens = _scan_log_dir(log_dir)
    old_w = max(gens) if gens else None
    # garbage collection: dirs the PREVIOUS compaction superseded (left
    # behind deliberately — see the grace-period note above) or a crash
    # left unswept. Readers already ignore both.
    for b in [b for b in batches if old_w is not None and b <= old_w]:
        shutil.rmtree(os.path.join(log_dir, batches.pop(b)))
    for g in [g for g in gens if old_w is not None and g < old_w]:
        shutil.rmtree(os.path.join(log_dir, gens.pop(g)))
    live = sorted(batches)
    fold = live[:-1]  # never the highest id: possibly in-flight
    if not fold:
        return
    new_w = max(fold)
    srcs = ([os.path.join(log_dir, gens[old_w])] if old_w is not None else []) + [
        os.path.join(log_dir, batches[b]) for b in fold
    ]
    agg = fold_agg(spark.read.parquet(*srcs))
    tmp = os.path.join(os.path.dirname(log_dir), "_compacting_" + os.path.basename(log_dir))
    if os.path.isdir(tmp):  # leftover scratch from a crashed compaction
        shutil.rmtree(tmp)
    agg.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, os.path.join(log_dir, f"gen={new_w}"))  # the commit
    # no post-commit sweep: the just-superseded dirs stay on disk until the
    # next compaction so concurrent in-flight reads keep their files


def read_name_counts(spark: SparkSession, table_dir: str) -> DataFrame:
    """(name, n) — aggregate of the log-structured partials (latest
    compacted generation + newer batch partials)."""
    partials = spark.read.parquet(
        *_live_paths(os.path.join(table_dir, "name_counts"))
    )
    return partials.groupBy("name").agg(F.sum("n").alias("n"))


def new_names_since(
    spark: SparkSession, table_dir: str, since_batch: int
) -> DataFrame:
    """Names whose FIRST partial arrived after ``since_batch`` — the
    incremental matching frontier. Uses the ``first_batch`` data column,
    which compaction preserves (min per name), so the frontier survives
    compaction (ADVICE r1)."""
    partials = spark.read.parquet(
        *_live_paths(os.path.join(table_dir, "name_counts"))
    )
    first_seen = partials.groupBy("name").agg(F.min("first_batch").alias("first_batch"))
    return first_seen.where(F.col("first_batch") > since_batch).select("name")


def compact_name_counts(spark: SparkSession, table_dir: str) -> None:
    """Maintenance: fold the current generation + a snapshot of batch
    partials into a NEW compacted generation ``gen=<W>`` (W = highest
    folded batch id), committed by one atomic rename. Readers take the
    latest generation plus batch ids > W (``_live_paths``), so:

    - the commit is ATOMIC for concurrent readers — before the rename they
      read the old generation + partials, after it the new generation
      supersedes exactly the partials it folded (no missing-data window,
      no double-count window);
    - a crash at ANY point loses nothing: before the rename the scratch
      dir is invisible (and cleaned on the next run), after it the folded
      batch dirs are superseded garbage that the NEXT compaction removes
      (deferred one cycle so reads in flight across the commit keep their
      files — see ``_compact_log_dir``);
    - the HIGHEST on-disk batch id is never folded: under foreachBatch's
      at-least-once contract it may be an uncommitted in-flight write
      that the restarted stream will REPLAY (overwriting its dir) —
      folding it would double-count every name in it after the replay.
      Older ids are durable (the stream has committed past them).

    First-seen provenance is aggregated into the generation
    (min(first_batch) per name), so ``new_names_since`` keeps working
    across compactions. Safe to run against a live stream."""
    _compact_log_dir(
        spark,
        os.path.join(table_dir, "name_counts"),
        lambda df: df.groupBy("name").agg(
            F.sum("n").alias("n"), F.min("first_batch").alias("first_batch")
        ),
    )


def compact_docs_seen(spark: SparkSession, table_dir: str) -> None:
    """Maintenance: fold the ``docs_seen`` registry partials into one
    compacted generation. Without this the registry gains one directory
    per micro-batch and the ingest sink's anti-join re-lists and re-reads
    every prior batch dir on each micro-batch — per-batch dedup cost grows
    linearly with stream lifetime (O(B²) cumulative read volume). After
    compaction the sink reads one generation + the handful of batch
    partials newer than its watermark. One row per content_hash survives
    (min(doc_id) as the first-sighting provenance, matching the
    within-batch dropDuplicates semantics). Safe against a live stream:
    same atomic gen-rename + never-fold-the-highest-id rules as
    ``compact_name_counts``, plus the one-cycle deferred sweep
    (``_compact_log_dir``) — the sink's per-micro-batch anti-join lists
    the registry once and reads it lazily, so the directories it listed
    must survive until the NEXT compaction run, not just until this one's
    commit. Run compactions no more often than the longest micro-batch."""
    _compact_log_dir(
        spark,
        os.path.join(table_dir, "docs_seen"),
        lambda df: df.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id")),
    )


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
