"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All expression-only (regexp/array builtins — whole-stage codegen, no
Python), each independently oracle-checkable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int_expr

# compact function-word profiles; ratio-of-hits argmax. On real corpora
# these are the top-20 stopwords per language; the classifier is the
# standard closed-class-word profile method (n-gram-free variant).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"),
}

STOPWORDS_EN = LANG_PROFILES["en"] + (
    "was", "with", "as", "on", "be", "at", "by", "this", "are", "or",
)


def _arr(words) -> str:
    return "array(" + ",".join("'" + w.replace("'", "\\'") + "'" for w in words) + ")"


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens, chars): whitespace tokens plus a
    BPE-ish proxy (\\w+ runs and single non-space symbols count separately —
    the standard pre-tokenizer split a byte-pair encoder sees)."""
    return docs.select(
        id_col,
        F.expr(f"size(filter(split({text_col}, ' '), t -> t <> ''))")
        .cast("bigint")
        .alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all({text_col}, '\\\\w+|[^\\\\w\\\\s]', 0))")
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.length(text_col).cast("bigint").alias("chars"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
    quality): length/punctuation/stopword heuristics à la C4/Gopher rules,
    combined into one [0,1] score."""
    toks = f"filter(split({text_col}, ' '), t -> t <> '')"
    d = docs.select(
        id_col,
        F.col(text_col).alias("_t"),
        F.expr(f"size({toks})").alias("_n"),
        F.expr(f"aggregate({toks}, 0, (a, t) -> a + length(t))").alias("_len_sum"),
        F.expr(
            f"size(filter({toks}, t -> array_contains({_arr(STOPWORDS_EN)}, lower(t))))"
        ).alias("_stop"),
        F.expr(f"size(regexp_extract_all({text_col}, '[^\\\\w\\\\s]', 0))").alias("_punct"),
    )
    d = d.select(
        id_col,
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.round(F.when(F.col("_n") > 0, F.col("_len_sum") / F.col("_n")).otherwise(0.0), 6)
        .alias("avg_token_len"),
        F.round(
            F.when(F.length("_t") > 0, F.col("_punct") / F.length("_t")).otherwise(0.0), 6
        ).alias("punct_ratio"),
        F.round(F.when(F.col("_n") > 0, F.col("_stop") / F.col("_n")).otherwise(0.0), 6)
        .alias("stopword_ratio"),
    )
    # quality: in-range token count, word lengths, some but not all stopwords
    return d.withColumn(
        "quality",
        F.round(
            (F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 0.4).otherwise(0.0))
            + (F.when((F.col("avg_token_len") >= 2) & (F.col("avg_token_len") <= 12), 0.3).otherwise(0.0))
            + (F.when(F.col("stopword_ratio") >= 0.01, 0.2).otherwise(0.0))
            + (F.when(F.col("punct_ratio") <= 0.2, 0.1).otherwise(0.0)),
            6,
        ),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, lang_score): stopword-profile argmax with
    deterministic tie-break on language code.

    ``zh`` is scored by CJK CHARACTER ratio, not stopword tokens: real
    Chinese text is unsegmented, so a whitespace token never equals a
    single-character profile entry and a token-based zh profile is dead
    code (every Chinese doc would tie at 0 and fall to the first language
    code). A doc matching NO profile is labeled ``und`` (unknown), not the
    alphabetically-first language."""
    toks = f"filter(split(lower({text_col}), ' '), t -> t <> '')"
    hits = [
        F.expr(
            f"size(filter({toks}, t -> array_contains({_arr(ws)}, t)))"
        ).alias(f"_h_{lang}")
        for lang, ws in sorted(LANG_PROFILES.items())
        if lang != "zh"
    ]
    cjk = (
        f"CASE WHEN length({text_col}) > 0 THEN "
        f"round(length(regexp_replace({text_col}, '[^一-鿿]', '')) / length({text_col}), 6) "
        "ELSE 0.0 END"
    )
    d = docs.select(
        id_col,
        F.expr(f"size({toks})").alias("_n"),
        F.expr(cjk).alias("_s_zh"),
        *hits,
    )
    scores = F.expr(
        "array("
        + ",".join(
            (
                f"named_struct('lang', '{lang}', 'score', _s_zh)"
                if lang == "zh"
                else f"named_struct('lang', '{lang}', 'score', "
                f"CASE WHEN _n > 0 THEN round(_h_{lang} / _n, 6) ELSE 0.0 END)"
            )
            for lang in sorted(LANG_PROFILES)
        )
        + ")"
    )
    best = (
        "array_sort(_scores, (l, r) -> CASE WHEN l.score > r.score THEN -1 "
        "WHEN l.score < r.score THEN 1 "
        "WHEN l.lang < r.lang THEN -1 WHEN l.lang > r.lang THEN 1 ELSE 0 END)[0]"
    )
    return (
        d.withColumn("_scores", scores)
        .withColumn("_best", F.expr(best))
        .select(
            id_col,
            F.when(F.col("_best.score") > 0.0, F.col("_best.lang"))
            .otherwise(F.lit("und"))
            .alias("pred_lang"),
            F.col("_best.score").alias("lang_score"),
        )
    )


def fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    mod: int = 8,
) -> DataFrame:
    """(doc_id, fp): mod-p fingerprint selection — hash every word n-gram,
    keep hashes ≡ 0 (mod ``mod``). The classic 0-mod-p document sketch
    (winnowing's simpler cousin): ~1/mod of the shingles survive, matching
    shingles always produce matching fingerprints across documents."""
    from .dedup import word_shingles

    sh = word_shingles(docs, text_col, id_col, n)
    return (
        sh.withColumn("fp", F.expr(md5_int_expr("shingle")))
        .where(F.col("fp") % mod == 0)
        .select(F.col("id").alias(id_col), "fp")
        .distinct()
    )


def stratified_sample(
    docs,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
):
    """Deterministic per-stratum document sampling — the training-mix
    curation step (e.g. "keep 50% of en, 25% of de, drop the rest").

    Keep iff md5(seed:id) (first 15 hex digits as int) mod 10^6 falls under
    rate[stratum]·10^6. Hash-gated, NOT rand(): the sample is reproducible
    across runs and engines, stable under repartitioning (Spark's
    rand(seed) is per-partition-indexed — a repartition silently changes
    the sample), and composable — re-running with a higher rate yields a
    SUPERSET of the previous sample, so a mix can be dialed up without
    re-shuffling what was already selected. Rates ride a broadcast map
    join; the filter is a pure Catalyst expression (codegen, pushdown-safe
    down to the stratum column scan)."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    rate_df = F.broadcast(
        spark.createDataFrame(
            [(k, float(v)) for k, v in sorted(rates.items())],
            f"{strata_col} string, _rate double",
        )
    )
    h = md5_int_expr(f"concat('{seed}', ':', cast({id_col} as string))")
    return (
        docs.join(rate_df, strata_col, "left")
        .withColumn("_rate", F.coalesce("_rate", F.lit(float(default_rate))))
        .where(F.expr(f"pmod({h}, 1000000)") < F.col("_rate") * 1000000)
        .drop("_rate")
    )
