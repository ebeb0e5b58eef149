"""Golden tests for clean_name / get_words parity.

Expected values hand-traced from the reference R semantics
(code/functions/match_names.R:131-163, 219-263), including the
initials-compaction quirks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from name_matching_spark.functions.normalize import (
    canonical_pair,
    with_clean_name,
    with_word_bag,
    word_count_expr,
)


def _run_clean(spark, names, **kw):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    out = with_clean_name(df, "name", "clean", **kw)
    rows = {r["name"]: r["clean"] for r in out.collect()}
    return [rows[n] for n in names]


def _run_bag(spark, names, **kw):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    out = with_word_bag(df, "name", "bag", **kw)
    rows = {r["name"]: r["bag"] for r in out.collect()}
    return [rows[n] for n in names]


COMPANY_GOLDEN = [
    ("J L Marshall Oil", "MARSHALL J-L-"),
    ("Marshall, J. L.", "MARSHALL -J-L"),
    ("A-1 Oil Co.", "A1"),
    ("EAGLE FORD ENERGY", "EAGLE FORD"),
    ("THE OIL COMPANY", ""),
    ("ÉNERGIE, Inc.", "ENERGIE"),
    ("ACME PETROLEUM LLC", "ACME"),
    ("ACME", "ACME"),
]


def test_clean_name_company_golden(spark):
    names = [n for n, _ in COMPANY_GOLDEN]
    got = _run_clean(spark, names, drop_common=True, human=False)
    for (name, want), g in zip(COMPANY_GOLDEN, got):
        assert g == want, f"{name!r}: got {g!r}, want {want!r}"


HUMAN_GOLDEN = [
    ("Smith, J. L.", "SMITH JL"),
    ("John Smith", "JOHN SMITH"),
    ("J Smith", "SMITH J"),
    ("smith   john", "SMITH JOHN"),
]


def test_clean_name_human_golden(spark):
    names = [n for n, _ in HUMAN_GOLDEN]
    got = _run_clean(spark, names, drop_common=False, human=True)
    for (name, want), g in zip(HUMAN_GOLDEN, got):
        assert g == want, f"{name!r}: got {g!r}, want {want!r}"


def test_word_bag_no_comma_replacement(spark):
    # get_words splits on space only — "SMITH,JOHN" stays one token with the
    # comma punct-stripped (reference match_names.R:131-140).
    (bag,) = _run_bag(spark, ["SMITH,JOHN"], drop_common=True)
    assert bag == ["SMITHJOHN"]


def test_word_bag_includes_compacted_initials(spark):
    (bag,) = _run_bag(spark, ["J L MARSHALL"], drop_common=True)
    assert bag == ["MARSHALL", "J-L-"]


def test_clean_name_idempotent_company(spark):
    names = [n for n, _ in COMPANY_GOLDEN]
    once = _run_clean(spark, names, drop_common=True)
    twice = _run_clean(spark, [c for c in once if c], drop_common=True)
    nonempty = [c for c in once if c]
    for a, b in zip(nonempty, twice):
        # initials fragments contain '-', which is punctuation-stripped on a
        # second pass; idempotence holds for names without compaction
        if "-" not in a:
            assert a == b


def test_canonical_pair(spark):
    df = spark.createDataFrame([("B", "A"), ("A", "B"), ("X", "X")], ["n", "m"])
    lo, hi = canonical_pair(F.col("n"), F.col("m"))
    rows = df.select(lo.alias("lo"), hi.alias("hi")).collect()
    assert all(r["lo"] == "A" and r["hi"] == "B" for r in rows[:2])
    assert rows[2]["lo"] == rows[2]["hi"] == "X"


def test_word_count(spark):
    df = spark.createDataFrame([("ACME OIL", "BOB'S WELL SVC")], ["name", "match"])
    got = df.select(word_count_expr("name", "match").alias("wc")).collect()[0]["wc"]
    # ACME, OIL = 2; BOB, S, WELL, SVC = 4
    assert got == 6
