"""Blocking-recall artifact generator (VERDICT r4 item 1).

Computes the exhaustive unblocked ground truth per blocked-pair channel
at a small scale factor (brute-force loops / DuckDB all-pairs — never the
operator's own blocking) and records measured vs designed recall:

    python tools/recall_check.py [--json RECALL_r05.json] [--sf SF_DIR]

Exact channels must show missed == 0; probabilistic channels must sit at
or above their stated expectation/floor. Exits non-zero on any violation,
so this doubles as a CI gate (tests/test_recall.py runs the same
functions with pytest assertions).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def violations(report: dict) -> list[str]:
    v = []
    ch = report["simhash_pairs"]
    if ch["missed"] or ch["extra"] or ch["value_mismatches"]:
        v.append(f"simhash_pairs not exact: {ch}")
    ch = report["dedup_jaccard"]
    if ch["missed"] or ch["extra"] or ch["max_jaccard_abs_diff"] > 1e-9:
        v.append(f"dedup_jaccard not exact: {ch}")
    ch = report["dedup_jaccard_maxdf"]
    if (
        ch["missed_in_filtered_space"]
        or ch["extra_in_filtered_space"]
        or ch["losses_unexplained_by_lineage"]
        or not ch["lineage_matches_bruteforce"]
    ):
        v.append(f"dedup_jaccard_maxdf not lineage-exact: {ch}")
    ch = report["dedup_minhash"]
    if ch["exact_dup_recall_must_be_1"] != 1.0:
        v.append("dedup_minhash missed an exact duplicate (J=1 must always collide)")
    if not ch["within_3_sigma"]:
        v.append(
            f"dedup_minhash recall {ch['measured_recall']:.4f} below "
            f"expectation {ch['expected_recall']:.4f} - 3sigma"
        )
    ch = report["ann_topk"]
    got = ch["clustered_planes8"]
    if got["recall_multi_probe"] < ch["floor_clustered_multi"]:
        v.append(f"ann_topk clustered multi-probe {got['recall_multi_probe']} < floor")
    if got["recall_single_probe"] < ch["floor_clustered_single"]:
        v.append(f"ann_topk clustered single-probe {got['recall_single_probe']} < floor")
    ch = report["ivf_topk"]
    if ch["clustered_c20_probe2_iters2"] < ch["floor_clustered_refined"]:
        v.append(f"ivf_topk refined clustered recall {ch['clustered_c20_probe2_iters2']} < floor")
    ch = report["jaro_channel"]
    closure = ch["vs_entity_truth"]["recall_full_surface_transitive_closure"]
    if closure < ch["vs_entity_truth"]["floor_full_surface_closure"]:
        v.append(
            "jaro_channel: full candidate surface (names+address) cannot "
            f"transitively connect all same-entity pairs (closure {closure})"
        )
    if ch["vs_jaro_truth"]["recall_union"] < ch["vs_jaro_truth"]["floor_union_regression"]:
        v.append(
            f"jaro_channel union recall vs jaro truth "
            f"{ch['vs_jaro_truth']['recall_union']} fell below the regression floor"
        )
    if ch["non_ascii_clean_names"]:
        v.append("jaro truth engine mismatch risk: non-ASCII clean names present")
    ch = report["human_channel"]
    if ch["missed"] or ch["extra"]:
        v.append(f"human_channel surname-blocked join not exact: {ch}")
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from name_matching_spark.recall import run_all
    from name_matching_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="recall_check", shuffle_partitions=8)
    t0 = time.time()
    report = run_all(spark, args.sf)
    report["elapsed_sec"] = round(time.time() - t0, 1)
    bad = violations(report)
    report["violations"] = bad
    out = json.dumps(report, indent=2, default=float)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")
    if bad:
        print("\nRECALL GATE FAILED:", *bad, sep="\n  ", file=sys.stderr)
        return 1
    print("\nall recall gates green", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
