"""Phonetic blocking key: a compact double-metaphone-style encoder.

North-star blocking channel (not present in the reference, which relies on
shared tokens only). This is a pragmatic primary-code double metaphone: the
major Philips rules (silent initial clusters, PH/TH/SH/CH digraphs, C/G
softening, X→KS, collapse of doubled consonants, vowels only word-initially)
— enough for phonetic bucketing of company/person tokens. Applied as a
pandas UDF over the *distinct first tokens only* (small domain), memoized
inside each Arrow batch via a uniques→map, so per-row Python work is O(unique
tokens), not O(rows).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_VOWELS = set("AEIOUY")

_INITIAL_SILENT = ("KN", "GN", "PN", "WR", "PS", "AE")


def double_metaphone(word: str, max_len: int = 6) -> str:
    """Primary double-metaphone-style code for an uppercase token."""
    if not word:
        return ""
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    if not w:
        return ""
    if w.startswith(_INITIAL_SILENT):
        w = w[1:]
    if w.startswith("X"):
        w = "S" + w[1:]
    out: list[str] = []
    i = 0
    n = len(w)

    def nxt(k: int = 1) -> str:
        return w[i + k] if i + k < n else ""

    while i < n and len(out) < max_len:
        c = w[i]
        if c in _VOWELS:
            if i == 0:
                out.append("A")
            i += 1
            continue
        # collapse doubles (except C, handled below for sCCion etc.)
        if nxt() == c and c != "C":
            i += 1
            continue
        if c == "B":
            out.append("P")
            i += 2 if nxt() == "B" else 1
        elif c == "C":
            if nxt() == "H":
                out.append("X")
                i += 2
            elif nxt() in ("I", "E", "Y"):
                out.append("S")
                i += 1
            elif w[i : i + 2] == "CC":
                out.append("K")
                i += 2
            else:
                out.append("K")
                i += 1
                if nxt(0) == "K":  # CK
                    i += 1
        elif c == "D":
            if w[i : i + 2] == "DG" and nxt(2) in ("I", "E", "Y"):
                out.append("J")
                i += 3
            else:
                out.append("T")
                i += 1
        elif c == "G":
            if nxt() == "H":
                # GH: silent unless word-initial
                if i == 0:
                    out.append("K")
                i += 2
            elif nxt() == "N":
                out.append("N")
                i += 2
            elif nxt() in ("I", "E", "Y"):
                out.append("J")
                i += 1
            else:
                out.append("K")
                i += 1
        elif c == "H":
            # keep H only between vowel and vowel
            if i > 0 and w[i - 1] in _VOWELS and nxt() in _VOWELS:
                out.append("H")
            i += 1
        elif c in ("F", "J", "L", "M", "N", "R"):
            out.append(c)
            i += 1
        elif c == "K":
            out.append("K")
            i += 1
        elif c == "P":
            if nxt() == "H":
                out.append("F")
                i += 2
            else:
                out.append("P")
                i += 1
        elif c == "Q":
            out.append("K")
            i += 1
        elif c == "S":
            if nxt() == "H":
                out.append("X")
                i += 2
            elif w[i : i + 3] in ("SIO", "SIA"):
                out.append("X")
                i += 1
            else:
                out.append("S")
                i += 1
        elif c == "T":
            if nxt() == "H":
                out.append("0")
                i += 2
            elif w[i : i + 3] in ("TIO", "TIA"):
                out.append("X")
                i += 1
            else:
                out.append("T")
                i += 1
        elif c == "V":
            out.append("F")
            i += 1
        elif c == "W":
            if nxt() in _VOWELS:
                out.append("W")
            i += 1
        elif c == "X":
            out.append("K")
            out.append("S")
            i += 1
        elif c == "Z":
            out.append("S")
            i += 1
        else:
            i += 1
    return "".join(out[:max_len])


def _metaphone_batch(tokens: pd.Series) -> pd.Series:
    uniq = tokens.dropna().unique()
    table = {t: double_metaphone(t) for t in uniq}
    return tokens.map(table)


# StringType instance (not DDL string) so the decorator needs no live session
from pyspark.sql.types import StringType  # noqa: E402

metaphone_udf = pandas_udf(_metaphone_batch, StringType())


def with_metaphone_key(
    names: DataFrame, bag_col: str, out: str = "metaphone_key"
) -> DataFrame:
    """Phonetic block key = double metaphone of the first bag token."""
    df = names.withColumn("_ft", F.element_at(F.col(bag_col), 1))
    df = df.where(F.col("_ft").isNotNull() & (F.col("_ft") != ""))
    return df.withColumn(out, metaphone_udf(F.col("_ft"))).drop("_ft").where(
        F.col(out) != ""
    )
