"""Name normalization as pure Spark SQL expressions (no UDFs).

Reimplements the reference's `clean_name` / `get_words` semantics
(reference: code/functions/match_names.R:97-163 and the live redefinition at
:219-263) entirely with built-in higher-order functions, so the hot path
stays inside whole-stage codegen — at 100 TB this is the difference between
a JVM-side projection and shipping every name through Python.

Semantics reproduced exactly (hand-traced from the R):

1. (clean_name only) commas → spaces; then split on single space.
2. per token: 'É'→'E', strip ASCII punctuation ([[:punct:]]), uppercase, trim.
3. drop_common_words=True: remove tokens in COMMON_WORDS (which contains ''
   and ' '); then remove STANDALONE_WORDS *only if* at least one token
   survives. drop_common_words=False: clean_name removes ''/' ' tokens;
   get_words keeps them.
4. initials compaction:
   - company mode: single-char tokens are joined positionally with '-'
     (multi-char tokens contribute an empty slot), '--' runs become
     separators, fragments shorter than 3 chars are dropped, fragments with
     ≥2 hyphens are kept only when longer than 3 chars. This preserves the
     reference's exact quirks: "J L MARSHALL" → ["MARSHALL", "J-L-"].
   - human mode: single-char tokens concatenate with no separator and no
     min-length filter: "SMITH J L" → ["SMITH", "JL"].
5. result = multi-char tokens (in order) ++ compacted-initials fragments.

All functions return Columns; `with_*` helpers stage the computation through
temporary columns so the catalyst tree stays small and shared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import COMMON_WORDS, STANDALONE_WORDS, normalized_stoplist


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _array_lit(words) -> str:
    return "array(" + ",".join(_sql_str(w) for w in words) + ")"


_COMMON_ARR = _array_lit(normalized_stoplist(COMMON_WORDS))
_STANDALONE_ARR = _array_lit(normalized_stoplist(STANDALONE_WORDS))

# per-token cleanup: É→E BEFORE upper (lowercase 'é' is intentionally not
# mapped, matching the reference), ASCII-punct strip, upper, trim.
_TOKEN_CLEAN = (
    "upper(trim(regexp_replace(translate({t}, 'É', 'E'), '[\\\\p{{Punct}}]', '')))"
)


def raw_token_expr(src: str, comma_to_space: bool) -> str:
    base = f"regexp_replace({src}, ',', ' ')" if comma_to_space else src
    split = f"split({base}, ' ')"
    return f"transform({split}, t -> {_TOKEN_CLEAN.format(t='t')})"


def _letters_expr(words_col: str, human: bool) -> str:
    sep = "" if human else "-"
    letters_str = (
        f"concat_ws('{sep}', transform({words_col}, w -> IF(length(w) > 1, '', w)))"
    )
    replaced = f"regexp_replace({letters_str}, '--', ' ')"
    parts = (
        f"CASE WHEN {replaced} = '' THEN array() ELSE split({replaced}, ' ') END"
    )
    if human:
        # no min-length filter in human mode (reference match_names.R:238-246)
        return f"filter({parts}, p -> size(split(p, '-')) - 1 < 2 OR length(p) > 3)"
    return (
        f"filter({parts}, p -> length(p) >= 3 AND "
        f"(size(split(p, '-')) - 1 < 2 OR length(p) > 3))"
    )


def with_word_bag(
    df: DataFrame,
    src: str,
    out: str,
    *,
    drop_common: bool = True,
    comma_to_space: bool = False,
    filter_empty: bool = False,
    human: bool = False,
) -> DataFrame:
    """Add ``out`` = array<string> token bag of ``src`` (get_words semantics).

    Defaults mirror the reference's `get_words(names)` call in the
    shared-word matcher (no comma replacement, drop common words).
    """
    toks = raw_token_expr(src, comma_to_space)
    if drop_common:
        df = df.withColumn(
            "_nm_t1", F.expr(f"filter({toks}, t -> NOT array_contains({_COMMON_ARR}, t))")
        )
        df = df.withColumn(
            "_nm_t2",
            F.expr(f"filter(_nm_t1, t -> NOT array_contains({_STANDALONE_ARR}, t))"),
        )
        df = df.withColumn(
            "_nm_w", F.expr("IF(size(_nm_t2) > 0, _nm_t2, _nm_t1)")
        )
    else:
        if filter_empty:
            df = df.withColumn(
                "_nm_w", F.expr(f"filter({toks}, t -> t <> '' AND t <> ' ')")
            )
        else:
            df = df.withColumn("_nm_w", F.expr(toks))
    df = df.withColumn("_nm_letters", F.expr(_letters_expr("_nm_w", human)))
    df = df.withColumn(
        out,
        F.expr("concat(filter(_nm_w, w -> length(w) <> 1), _nm_letters)"),
    )
    return df.drop("_nm_t1", "_nm_t2", "_nm_w", "_nm_letters")


def with_clean_name(
    df: DataFrame,
    src: str,
    out: str,
    *,
    drop_common: bool = False,
    human: bool = False,
) -> DataFrame:
    """Add ``out`` = cleaned-name string (clean_name semantics: commas→space,
    empty-token filter when not dropping common words)."""
    bag = f"_nm_bag_{out}"
    df = with_word_bag(
        df,
        src,
        bag,
        drop_common=drop_common,
        comma_to_space=True,
        filter_empty=not drop_common,
        human=human,
    )
    df = df.withColumn(out, F.concat_ws(" ", F.col(bag)))
    return df.drop(bag)


def canonical_pair(a: Column, b: Column) -> tuple[Column, Column]:
    """Alphabetical (name, match) ordering — reference utils.R:5-9
    (`alpha_order`) without any UDF."""
    return F.least(a, b), F.greatest(a, b)


def word_count_expr(name: str, match: str) -> Column:
    r"""`str_count(name,'\w+') + str_count(match,'\w+')` — reference
    pre_screen_names.R:183. Uses regexp_count on \w+ runs."""
    return (
        F.expr(f"size(regexp_extract_all({name}, '\\\\w+', 0))")
        + F.expr(f"size(regexp_extract_all({match}, '\\\\w+', 0))")
    ).cast("int")
