"""Round-2 cluster merging + notification tables."""

from pyspark.sql import functions as F

from name_matching_spark.operators.grouping import (
    notifications,
    regroup_clusters,
)


def test_regroup_clusters(spark):
    clusters = spark.createDataFrame(
        [
            ("ACME OIL CO", 1, "ACME OIL"),
            ("ACME OPERATING", 1, "ACME OIL"),
            ("ACME PETROLEUM", 2, "ACME PETRO"),
            ("BOLT GAS", 3, "BOLT"),
        ],
        ["name", "cluster", "group_name"],
    )
    # round-2 says the two ACME groups are the same entity
    pairs = spark.createDataFrame([("ACME OIL", "ACME PETRO")], ["name", "match"])
    out = regroup_clusters(clusters, pairs)
    rows = {(r["name"], r["group_name"]) for r in out.collect()}
    # every ACME member now labeled with the alphabetically-first group name
    assert ("ACME OIL CO", "ACME OIL") in rows
    assert ("ACME PETROLEUM", "ACME OIL") in rows
    assert ("ACME PETRO", "ACME OIL") in rows  # merged-away representative
    assert ("BOLT GAS", "BOLT") in rows
    # dense cluster ids over the two remaining groups
    ids = {r["group_name"]: r["cluster"] for r in out.collect()}
    assert sorted(set(ids.values())) == [1, 2]


def test_notifications(spark):
    screened = spark.createDataFrame(
        [
            ("A CO", "A CORP", "BOX 1 TX"),
            ("B LLC", "B LP", None),
        ],
        ["name", "match", "address"],
    )
    reviewed = spark.createDataFrame(
        [("A CO", "A CORP", 0), ("B LLC", "B LP", 1), ("C1", "C2", 1)],
        ["name", "match", "keep"],
    )
    prior = spark.createDataFrame(
        [("C1", "C0"), ("C2", "C0")], ["name", "group_name"]
    )
    prev_non, inferred = notifications(screened, reviewed, prior)
    assert [(r["name"], r["match"]) for r in prev_non.collect()] == [("A CO", "A CORP")]
    inf = {(r["name"], r["match"]) for r in inferred.collect()}
    # clique completion of {C0,C1,C2} = 3 edges; (C1,C2) already reviewed
    assert inf == {("C0", "C1"), ("C0", "C2")}
