"""spark-submit entry point for the batch-incremental refresh.

The deployment loop this closes (ARCHITECTURE.md "lambda" shape):

1. the streaming assigner (`streaming/incremental.py`) gives names an
   immediate provisional cluster as documents land, with bounded state;
2. THIS job runs on a schedule: it takes the names first seen since the
   last run (the streaming frontier), resolves them against the PRIOR
   cluster table's representatives (`pipeline.incremental_resolve` —
   a |new| + |clusters| universe, not |corpus|), and commits the updated
   cluster table through the crash-safe `merge_into` generation store;
3. a full `resolve_job` re-run stays the periodic exactness backstop.

Usage::

    spark-submit --py-files nm_spark.zip jobs/incremental_job.py \
        --new-names /tables/frontier.parquet \
        --clusters-store /tables/clusters \
        [--full-output /tables/clusters_latest.parquet]

``--clusters-store`` is a merge_into generation table; the first run may
seed it from a full resolve's output with ``--seed <parquet>``.
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


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--new-names", help="parquet with a `name` column")
    p.add_argument("--clusters-store", required=True)
    p.add_argument("--seed", help="seed the store from a full resolve output")
    p.add_argument("--full-output", help="also write the merged table as plain parquet")
    p.add_argument(
        "--member-sample-k",
        type=int,
        default=0,
        help="also match new names against up to K sampled non-representative "
        "members per prior cluster (0 = rep-only, the default contract)",
    )
    args = p.parse_args(argv)
    if not args.new_names and not args.seed:
        p.error("--new-names is required (or --seed for the first run)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("incremental_resolve").getOrCreate()

    from name_matching_spark.io import merge_into, read_merged

    if args.seed:
        seed = spark.read.parquet(args.seed).select("name", "cluster", "group_name")
        gen = merge_into(spark, args.clusters_store, seed, keys=["name"])
        print(json.dumps({"seeded": seed.count(), "gen": gen}))
        if not args.new_names:
            return 0

    prior = read_merged(spark, args.clusters_store)
    if prior is None:
        print(json.dumps({"error": "clusters store is empty; run with --seed first"}))
        return 1

    from name_matching_spark.pipeline import incremental_resolve

    new_names = spark.read.parquet(args.new_names).select("name").distinct()
    updated = incremental_resolve(
        new_names, prior, member_sample_k=args.member_sample_k
    )
    # the refreshed clustering supersedes the prior rows for re-clustered
    # names (drift reconciliation can move a member), so new rows win
    gen = merge_into(
        spark, args.clusters_store, updated, keys=["name"], when_matched="overwrite"
    )
    merged = read_merged(spark, args.clusters_store)
    if args.full_output:
        merged.write.mode("overwrite").parquet(args.full_output)
    print(
        json.dumps(
            {
                "new_names": new_names.count(),
                "updated_rows": updated.count(),
                "store_rows": merged.count(),
                "gen": gen,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
