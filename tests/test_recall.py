"""Blocking-recall gates (VERDICT r4 item 1): exhaustive UNBLOCKED ground
truth per blocked-pair channel at sf0.001, independent of the operators'
own blocking — the class of check the mirrored DuckDB oracles cannot do
(a blocking bug that silently loses pairs keeps every hash green; the
round-4 simhash banding defect proved it). tools/recall_check.py writes
the committed RECALL_r{N}.json artifact from the same functions."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def report(spark):
    from name_matching_spark.recall import run_all

    return run_all(spark, SF_DIR)


def test_simhash_pairs_exact(report):
    # pigeonhole guarantee: with bands >= max_hamming+1 the banded join
    # must produce EXACTLY the brute-force all-pairs Hamming<=6 set
    ch = report["simhash_pairs"]
    assert ch["truth_pairs"] > 0
    assert ch["missed"] == 0 and ch["extra"] == 0
    assert ch["value_mismatches"] == 0


def test_jaccard_exact(report):
    # J > 0 requires a shared shingle, so the inverted-index join is a
    # lossless blocking — output must equal the exhaustive Python loop
    ch = report["dedup_jaccard"]
    assert ch["truth_pairs"] > 0
    assert ch["missed"] == 0 and ch["extra"] == 0
    assert ch["max_jaccard_abs_diff"] <= 1e-9


def test_jaccard_maxdf_lineage_exact(report):
    # with max_df the contract is J over SURVIVING shingles: exact there,
    # and every unfiltered-truth miss must touch a dropped hot shingle
    ch = report["dedup_jaccard_maxdf"]
    assert ch["missed_in_filtered_space"] == 0
    assert ch["extra_in_filtered_space"] == 0
    assert ch["lineage_matches_bruteforce"]
    assert ch["losses_unexplained_by_lineage"] == 0


def test_minhash_designed_miss_rate(report):
    # stated per-pair hit probability 1-(1-J^r)^b: exact dups must ALWAYS
    # collide; overall measured recall within 3 sigma of the expectation
    ch = report["dedup_minhash"]
    assert ch["exact_dup_pairs"] > 0
    assert ch["exact_dup_recall_must_be_1"] == 1.0
    assert ch["within_3_sigma"], (ch["measured_recall"], ch["expected_recall"])


def test_ann_recall_floors(report):
    ch = report["ann_topk"]
    got = ch["clustered_planes8"]
    assert got["recall_multi_probe"] >= ch["floor_clustered_multi"]
    assert got["recall_single_probe"] >= ch["floor_clustered_single"]


def test_ivf_recall_floor(report):
    ch = report["ivf_topk"]
    assert ch["clustered_c20_probe2_iters2"] >= ch["floor_clustered_refined"]


def test_jaro_channel_blocking_recall(report):
    ch = report["jaro_channel"]
    # truth computed by an independent engine over ASCII-only names
    assert ch["non_ascii_clean_names"] == 0
    assert ch["jaro_truth_pairs"] > 0 and ch["entity_truth_pairs"] > 0
    vj = ch["vs_jaro_truth"]
    # the char-shingle LSH family keeps the union near-exhaustive on
    # jaro-close pairs; this floor guards against blocking regressions
    assert vj["recall_union"] >= vj["floor_union_regression"]
    ve = ch["vs_entity_truth"]
    # the hard product gate: the full candidate surface must be able to
    # transitively connect (and therefore cluster) every same-entity pair
    assert (
        ve["recall_full_surface_transitive_closure"]
        >= ve["floor_full_surface_closure"]
    )


def test_human_channel_blocked_join_exact(report):
    # the surname-blocked self-join must equal the independent Python
    # double loop over the (hash-oracled) parts table — catches key
    # normalization / null-handling / id-tie bugs the mirrored
    # human_pairs oracle cannot see; companies must be filtered out
    ch = report["human_channel"]
    assert ch["truth_pairs"] > 0
    assert ch["missed"] == 0 and ch["extra"] == 0
    assert ch["recall"] == 1.0
    assert ch["companies_excluded"] >= 3
    # the designed exclusion class is present in the fixture universe
    # (same first name, different surname) — counted, not asserted empty
    assert ch["cross_surname_same_first_excluded"] > 0
