"""Cross-engine normalization fuzz: clean_name / get_words parity on
adversarial random names.

The EDGE_NAMES fixture covers hand-picked normalization traps; this fuzz
sweeps a seeded random sample of the same character domain (letters,
digits, commas, hyphens, periods, ampersands, É, doubled spaces, leading/
trailing junk) and asserts the Spark SQL expressions and the DuckDB oracle
expressions produce IDENTICAL clean names and token bags — the primitive
every contract oracle builds on (reference semantics:
code/functions/clean_names.R:15-74, get_words at match_names.R:131-140).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F


ALPHABET = list("ABCDEFGHIJKLMNOPQRSTUVWXYZ") + list("0123456789") + list(
    " ,-.&/É'"
) + [" ", " "]  # extra spaces raise the odds of doubled/edge whitespace


def _rand_name(rng: random.Random) -> str:
    n = rng.randint(0, 24)
    s = "".join(rng.choice(ALPHABET) for _ in range(n))
    # sprinkle structured fragments the stoplists actually react to
    if rng.random() < 0.3:
        s += rng.choice([" INC", " LLC", " CO", " THE", " OIL", " JR", ",THE"])
    if rng.random() < 0.2:
        s = rng.choice(["THE ", "A ", "J L ", "A-1 "]) + s
    return s


def test_human_clean_name_parity_fuzz(spark):
    # the human-mode clean_name (no ≥3-char token filter, no hyphen-run
    # dash separator) backs the human_extract oracle chain — fuzz it too
    from name_matching_spark.contract import duck_clean_expr
    from name_matching_spark.functions.normalize import with_clean_name

    rng = random.Random(20260818)
    names = sorted({_rand_name(rng) for _ in range(800)} - {""})
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    out = with_clean_name(df, "name", "clean_name", drop_common=False, human=True)
    got = {r["name"]: r["clean_name"] for r in out.collect()}

    con = duckdb.connect()
    vals = ",".join("('" + n.replace("'", "''") + "')" for n in names)
    sql = f"""
    SELECT name,
           {duck_clean_expr("name", "clean_name", drop_common=False, human=True)}
    FROM (VALUES {vals}) AS t(name)
    """
    want = dict(con.execute(sql).fetchall())
    mismatches = {n: (got[n], want[n]) for n in names if got[n] != want[n]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. " + str(
        list(mismatches.items())[:5]
    )


@pytest.mark.parametrize("drop_common", [True, False])
def test_clean_name_and_bag_parity_fuzz(spark, drop_common):
    from name_matching_spark.contract import duck_bag_cte, duck_clean_expr
    from name_matching_spark.functions.normalize import (
        with_clean_name,
        with_word_bag,
    )

    rng = random.Random(20260817)
    names = sorted({_rand_name(rng) for _ in range(800)} - {""})

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    out = with_clean_name(df, "name", "clean_name", drop_common=drop_common)
    out = with_word_bag(
        out, "name", "bag", drop_common=drop_common, comma_to_space=False
    )
    got = {
        r["name"]: (r["clean_name"], tuple(r["bag"]))
        for r in out.select("name", "clean_name", "bag").collect()
    }

    con = duckdb.connect()
    vals = ",".join("(" + "'" + n.replace("'", "''") + "'" + ")" for n in names)
    sql = f"""
    SELECT name,
           {duck_clean_expr("name", "clean_name", drop_common=drop_common)},
           {duck_bag_cte("name", "bag", drop_common=drop_common, comma_to_space=False)}
    FROM (VALUES {vals}) AS t(name)
    """
    want = {
        n: (c, tuple(b)) for n, c, b in con.execute(sql).fetchall()
    }

    assert set(got) == set(want)
    mismatches = {
        n: (got[n], want[n]) for n in names if got[n] != want[n]
    }
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. " + str(
        list(mismatches.items())[:5]
    )
