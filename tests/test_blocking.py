"""Blocking: hot-key caps (logged, never silent) and cap-and-split
completeness (every within-block pair produced exactly once)."""

import itertools

from pyspark.sql import functions as F

from name_matching_spark.operators.blocking import (
    minhash_band_keys,
    pairs_from_index,
    split_oversized_blocks,
)


def test_hot_key_cap_logged(spark):
    rows = [(f"n{i}", "HOT") for i in range(10)] + [("a", "COLD"), ("b", "COLD")]
    idx = spark.createDataFrame(rows, ["name", "token"])
    pairs, dropped = pairs_from_index(idx, "token", max_block=5)
    assert [(r["token"], r["block_size"]) for r in dropped.collect()] == [("HOT", 10)]
    got = {(r["name"], r["match"]) for r in pairs.collect()}
    assert got == {("a", "b")}  # hot block excluded, cold block paired


def test_cap_and_split_completeness(spark):
    # one block of 23 names with cap 5 → tasks bounded, pair set complete
    names = [f"name{i:02d}" for i in range(23)]
    idx = spark.createDataFrame([(n, "K") for n in names], ["name", "token"])
    tasks = split_oversized_blocks(idx, "token", cap=5)
    # enumerate pairs inside each task: same task_key, respecting sub-group
    # sides (lo side × hi side; lo == hi → upper triangle)
    t = tasks.collect()
    by_task: dict[str, list] = {}
    for r in t:
        by_task.setdefault(r["task_key"], []).append(r)
    produced = set()
    dup_check = []
    for rows in by_task.values():
        lo, hi = rows[0]["task_lo"], rows[0]["task_hi"]
        if lo == hi:
            members = sorted({r["name"] for r in rows})
            for a, b in itertools.combinations(members, 2):
                produced.add((a, b))
                dup_check.append((a, b))
        else:
            side_lo = sorted({r["name"] for r in rows if r["sub_group"] == lo})
            side_hi = sorted({r["name"] for r in rows if r["sub_group"] == hi})
            for a in side_lo:
                for b in side_hi:
                    pair = (min(a, b), max(a, b))
                    produced.add(pair)
                    dup_check.append(pair)
    expected = {(a, b) for a, b in itertools.combinations(sorted(names), 2)}
    assert produced == expected
    assert len(dup_check) == len(expected)  # exactly once
    # task-side bound: no task sees more than ~2*cap names
    assert max(len(rows) for rows in by_task.values()) <= 2 * 5 + 5


def test_minhash_bands_deterministic(spark):
    df = spark.createDataFrame(
        [("A", ["X", "Y", "Z"]), ("B", ["X", "Y", "Z"]), ("C", ["Q", "R", "S"])],
        ["name", "bag"],
    )
    keys = minhash_band_keys(df, "bag", num_hashes=8, bands=4)
    by_name = {}
    for r in keys.collect():
        by_name.setdefault(r["name"], set()).add(r["band_key"])
    assert by_name["A"] == by_name["B"]          # identical bags → identical bands
    assert not (by_name["A"] & by_name["C"])     # disjoint bags → no collision
