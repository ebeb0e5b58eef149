"""Connected components vs a union-find oracle on random graphs."""

from __future__ import annotations

import random

import pytest

from name_matching_spark.operators.cc import connected_components, name_clusters


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 25), (2, 80, 60), (3, 120, 200)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    nodes = [f"N{i:03d}" for i in range(n_nodes)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find_components(edges)
    df = spark.createDataFrame(edges, ["name", "match"])
    got = {
        r["name"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == want


def test_cc_chain(spark):
    # a long path exercises multi-round convergence
    edges = [(f"X{i:02d}", f"X{i+1:02d}") for i in range(40)]
    df = spark.createDataFrame(edges, ["name", "match"])
    got = connected_components(df).collect()
    assert all(r["component"] == "X00" for r in got)
    assert len(got) == 41


def test_name_clusters_reference_semantics(spark):
    df = spark.createDataFrame(
        [
            ("B", "A", 1),
            ("C", "B", 1),
            ("Z", "Y", 1),
            ("Q", "R", 0),  # filtered: keep != 1
        ],
        ["name", "match", "keep"],
    )
    rows = name_clusters(df).collect()
    by_name = {r["name"]: r for r in rows}
    # group representative is min(name); representative row itself is dropped
    assert set(by_name) == {"B", "C", "Z"}
    assert by_name["B"]["group_name"] == "A"
    assert by_name["C"]["group_name"] == "A"
    assert by_name["Z"]["group_name"] == "Y"
    # dense cluster ids
    assert {r["cluster"] for r in rows} == {1, 2}


def test_cc_reliable_checkpoint(spark, tmp_path):
    # VERDICT r1 item 5: CC converges with fault-tolerant df.checkpoint()
    # when a reliable checkpoint dir is configured, same result as local mode
    from name_matching_spark.session import set_reliable_checkpoint_dir

    rng = random.Random(7)
    nodes = [f"R{i:03d}" for i in range(60)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    df = spark.createDataFrame(edges, ["name", "match"])
    local = {(r["name"], r["component"]) for r in connected_components(df).collect()}
    set_reliable_checkpoint_dir(str(tmp_path / "ckpt"))
    try:
        reliable = {
            (r["name"], r["component"]) for r in connected_components(df).collect()
        }
    finally:
        set_reliable_checkpoint_dir(None)
    assert reliable == local
    import os

    assert os.listdir(str(tmp_path / "ckpt"))  # checkpoint files actually written


def test_dense_ids_dataframe_native(spark):
    # VERDICT r1 item 6: dense_ids == dense_rank over global sort, no .rdd
    from pyspark.sql import functions as F

    from name_matching_spark.operators.cc import dense_ids

    vals = [(f"V{i:04d}",) for i in range(537)]
    random.Random(3).shuffle(vals)
    df = spark.createDataFrame(vals, ["group_name"])
    got = {r["group_name"]: r["cluster"] for r in dense_ids(df, "group_name").collect()}
    expected = {v: i + 1 for i, v in enumerate(sorted(v for (v,) in vals))}
    assert got == expected


def test_cc_int_id_path_matches_string_path(spark):
    # the dense-int-id fast path (auto above CC_INT_ID_THRESHOLD edges) must
    # produce byte-identical components to the string path on any graph
    rng = random.Random(11)
    nodes = [f"N{i:03d}" for i in range(100)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    df = spark.createDataFrame(edges, ["name", "match"])
    got_s = sorted(
        (r["name"], r["component"])
        for r in connected_components(df, int_ids=False).collect()
    )
    got_i = sorted(
        (r["name"], r["component"])
        for r in connected_components(df, int_ids=True).collect()
    )
    assert got_s == got_i
    oracle = _union_find_components([e for e in edges if e[0] != e[1]])
    assert dict(got_i) == oracle


def test_self_loop_only_nodes_are_singletons(spark):
    # "(name, component) for every node in edges": a node whose only edge
    # is a self-loop must surface as its own singleton component
    from name_matching_spark.operators.cc import connected_components

    edges = spark.createDataFrame(
        [("A", "B"), ("C", "C"), ("A", "A")], "name string, match string"
    )
    got = {(r["name"], r["component"]) for r in connected_components(edges).collect()}
    assert got == {("A", "A"), ("B", "A"), ("C", "C")}
