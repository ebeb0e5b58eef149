"""spark-submit entry point for the human-review loop.

The reference's workflow (pre_screen_names.R:198 writes the review CSV
ordered by importance_dist; :226 re-ingests hand labels with never-
overwrite semantics; makefile:148-152 renders the progress summary). This
job is the Spark-side wiring of that loop around the ``pre_screen``
checkpoint stage written by jobs/resolve_job.py:

    # 1. emit the pairs awaiting review, most important first
    spark-submit --py-files nm_spark.zip jobs/review_job.py emit \
        --checkpoint /ckpt --out /reviews/batch1

    # 2. a human fills the `keep` column of the emitted CSV, then:
    spark-submit --py-files nm_spark.zip jobs/review_job.py ingest \
        --reviewed /reviews/batch1_done.csv --labels-store /labels

    # 3. progress report (reference name_matching_summary.Rmd)
    spark-submit --py-files nm_spark.zip jobs/review_job.py summary \
        --checkpoint /ckpt

The labels store is what a re-run of resolve_job passes as --labels; the
merge is never-overwrite (operators/prescreen.merge_labels), so earlier
human decisions always win over later imports — same invariant as the
reference's read-modify-write of its review CSVs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# importable both under spark-submit --py-files AND as `python jobs/<job>.py`
# (python puts jobs/ on sys.path, not the repo root)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _spark():
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName("review_job").getOrCreate()


REVIEW_COLS = [
    "name", "match", "shared_words", "cosine_similarity", "jw_distance",
    "human_jw_distance", "human_cosine_similarity", "importance_dist",
    "rf_prob", "keep",
]


def emit(args) -> int:
    """Pairs with no decision yet, ordered by importance_dist ascending
    (0 = inside the must-review region), one CSV directory out."""
    from pyspark.sql import functions as F

    spark = _spark()
    screened = spark.read.parquet(os.path.join(args.checkpoint, "pre_screen"))
    cols = [c for c in REVIEW_COLS if c in screened.columns]
    pending = (
        screened.where(F.col("keep").isNull())
        .select(*cols)
        .orderBy(F.col("importance_dist").asc_nulls_last(), "name", "match")
    )
    # a review file is human-sized by construction; single CSV part
    pending.coalesce(1).write.mode("overwrite").option("header", True).csv(args.out)
    print(json.dumps({"pending_pairs": pending.count(), "out": args.out}))
    return 0


def ingest(args) -> int:
    """Merge a reviewed CSV (name, match, keep) into the labels store with
    never-overwrite semantics; rows whose keep is still empty are ignored.

    The store is a ``merge_into`` generation table: each ingest commits a
    new snapshot by atomic rename, so a crash mid-merge leaves the previous
    labels intact (ADVICE r2 — the old overwrite-in-place could lose the
    whole store)."""
    from pyspark.sql import functions as F

    from name_matching_spark.io import merge_into, read_merged

    spark = _spark()
    new = (
        spark.read.option("header", True).csv(args.reviewed)
        .select(
            "name", "match", F.col("keep").cast("double").alias("keep")
        )
        .where(F.col("keep").isNotNull())
    )
    store = os.path.join(args.labels_store, "labels")
    gen = merge_into(
        spark, store, new, keys=["name", "match"], when_matched="keep_existing"
    )
    n = read_merged(spark, store).count()
    print(json.dumps(
        {"labels_total": n, "ingested": new.count(), "store": store, "gen": gen}
    ))
    return 0


def summary(args) -> int:
    """Per-stage review progress (reference name_matching_summary.Rmd)."""
    from name_matching_spark.operators.prescreen import review_summary

    spark = _spark()
    screened = spark.read.parquet(os.path.join(args.checkpoint, "pre_screen"))
    out = review_summary([
        ("modeled", screened, True),
        ("all_pairs", screened, False),
    ])
    rows = [r.asDict() for r in out.collect()]
    print(json.dumps({"review_summary": rows}))
    return 0


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("emit")
    pe.add_argument("--checkpoint", required=True)
    pe.add_argument("--out", required=True)
    pi = sub.add_parser("ingest")
    pi.add_argument("--reviewed", required=True)
    pi.add_argument("--labels-store", required=True)
    ps = sub.add_parser("summary")
    ps.add_argument("--checkpoint", required=True)
    args = p.parse_args(argv)
    return {"emit": emit, "ingest": ingest, "summary": summary}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
