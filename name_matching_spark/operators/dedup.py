"""Document deduplication operators for large-scale training-data pipelines.

Five dedup families, all expressed as set-oriented DataFrame ops so they
scale to the 10^12-document tier the same way the name-matching blocking
does (explode → equi-join on a derived key → aggregate):

- exact:      md5(text) groupBy — one shuffle, no UDF.
- MinHash-LSH: shingle → minhash signature → band keys → bucket join.
  Hashing is md5-derived arithmetic (identical in DuckDB — see
  contract.py SPARK_H/DUCK_H) so every stage is oracle-checkable.
- SimHash:    weighted bit-majority over token hashes; near-dup = band-
  blocked Hamming distance.
- n-gram Jaccard: word-shingle inverted index; J = |∩| / (|A|+|B|-|∩|)
  computed from the shared-shingle join (lossless for J > 0).
- embedding near-dup: see similarity.py (cosine over vector columns).

Skew note: hot shingles (boilerplate) are the dedup analogue of hot name
tokens; ``max_df`` drops shingles appearing in more than that many docs
from the *join* (their Jaccard contribution is bounded and they explode
the pair count) — dropped keys are returned for lineage, never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERSENNE = (1 << 31) - 1

# md5 → int64: first 15 hex chars, positive, < 2^60; bit-for-bit equal to
# DuckDB's ('0x'||substr(md5(x),1,15))::BIGINT (verified in contract tests)
def md5_int_expr(x: str) -> str:
    return f"cast(conv(substr(md5({x}),1,15),16,10) as bigint)"


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, keep_id, group_size): every doc annotated with the minimum
    doc id of its exact-text group. keep_id == doc_id ⇔ the canonical copy.

    NULL texts form their own group (sentinel hash): md5(NULL) is NULL and
    a plain equi-join drops NULL keys, which would silently delete every
    NULL-text doc from the output instead of annotating it."""
    h = docs.select(
        id_col,
        F.coalesce(F.md5(F.col(text_col)), F.lit("__null_text__")).alias("text_hash"),
    )
    groups = h.groupBy("text_hash").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("group_size")
    )
    return h.join(groups, "text_hash").select(id_col, "keep_id", "group_size")


def word_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) distinct word n-grams, built with sequence+transform —
    no UDF, stays in whole-stage codegen."""
    toks = f"filter(split({text_col}, ' '), t -> t <> '')"
    # guard: Spark's sequence(1, 0) DESCENDS ([1,0]) instead of returning
    # empty, so short docs need an explicit empty-array branch
    sh = (
        f"IF(size({toks}) >= {n}, "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')), "
        f"CAST(array() AS array<string>))"
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.expr(sh)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-duplicate pairs by word-n-gram Jaccard ≥ threshold.

    Returns (pairs(id_a, id_b, jaccard), dropped_shingles(shingle, df)).
    The shared-shingle join is lossless: J > 0 requires ≥ 1 shared shingle.
    """
    sh = word_shingles(docs, text_col, id_col, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        dropped = df_counts.where(F.col("df") > max_df)
        sh_join = sh.join(F.broadcast(dropped.select("shingle")), "shingle", "left_anti")
    else:
        dropped = sh.sparkSession.createDataFrame([], "shingle string, df long")
        sh_join = sh
    # sizes over the SAME filtered shingle space as the intersection:
    # mixing post-filter `shared` with pre-filter sizes would systematically
    # underestimate J (two identical docs with hot shingles dropped would
    # score 0.33, not 1.0) — with max_df the score IS Jaccard over the
    # surviving shingles, consistently on both terms
    sizes = sh_join.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh_join.select(F.col("id").alias("id_a"), "shingle")
    b = sh_join.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    pairs = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs, dropped


def minhash_signature_exprs(
    tokens_expr: str, num_hashes: int, seed: int = 20260816
) -> list[str]:
    """SQL expressions for an md5-based MinHash signature over an array
    expression — universal hashing mod the Mersenne prime 2^31-1
    (coefficients < p, hashes < p ⇒ a*h+b < 2^62: no int64 overflow under
    Spark 4 ANSI mode)."""
    import random

    rng = random.Random(seed)
    h = md5_int_expr("t")
    out = []
    for _ in range(num_hashes):
        a = rng.randrange(1, _MERSENNE)
        b = rng.randrange(0, _MERSENNE)
        out.append(
            f"aggregate({tokens_expr}, CAST({_MERSENNE} AS BIGINT), "
            f"(acc, t) -> least(acc, ({a}L * ({h} % {_MERSENNE}L) + {b}L) % {_MERSENNE}L))"
        )
    return out


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 20260816,
) -> DataFrame:
    """Candidate near-dup pairs: docs whose MinHash signatures collide in at
    least one LSH band. Output (id_a, id_b, n_bands) — n_bands = number of
    colliding bands (a cheap confidence proxy)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    toks = f"filter(split({text_col}, ' '), t -> t <> '')"
    sig = "array(" + ",".join(minhash_signature_exprs(toks, num_hashes, seed)) + ")"
    d = docs.select(F.col(id_col).alias("id"), F.expr(sig).alias("_sig")).where(
        F.expr(f"size({toks})") > 0
    )
    band_structs = ",".join(
        f"named_struct('band', {bi}, 'key', "
        f"concat_ws('-', slice(_sig, {bi * rows + 1}, {rows})))"
        for bi in range(bands)
    )
    keyed = d.select(
        "id", F.explode(F.expr(f"array({band_structs})")).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a = keyed.select(F.col("id").alias("id_a"), "band", "key")
    b = keyed.select(F.col("id").alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("band").alias("n_bands"))
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
) -> DataFrame:
    """(id, simhash) — bit-majority SimHash over word token hashes.

    bit j of md5_int(token) votes +1/-1 on output bit j; the fingerprint
    sets bit j iff the weighted sum is positive. 48 bits keeps every
    intermediate in non-negative int64 (2^47·tokens ≪ 2^63) under ANSI
    arithmetic. Pure SQL: explode tokens × bit positions, two groupBys.
    """
    toks = f"filter(split({text_col}, ' '), t -> t <> '')"
    h = md5_int_expr("tok")
    t = docs.select(
        F.col(id_col).alias("id"), F.explode(F.expr(toks)).alias("tok")
    )
    t = t.withColumn("_h", F.expr(h))
    bitpos = t.select(
        "id", "_h", F.explode(F.expr(f"sequence(0, {bits - 1})")).alias("j")
    )
    votes = bitpos.withColumn(
        "v", F.when(F.expr("shiftright(_h, j) & 1") == 1, 1).otherwise(-1)
    )
    bit_sums = votes.groupBy("id", "j").agg(F.sum("v").alias("s"))
    return bit_sums.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_near_pairs(
    sims: DataFrame,
    bits: int = 48,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, blocked on
    equal-width bit-bands (a pair within Hamming ≤ bands-1 always collides
    in ≥ 1 band — pigeonhole), then verified exactly via bit_count(xor).
    Output (id_a, id_b, hamming).

    ``bands`` is widened automatically to the smallest divisor of ``bits``
    that is ≥ max_hamming + 1: with fewer bands the pigeonhole guarantee
    does not reach the requested radius and pairs with
    bands ≤ hamming ≤ max_hamming would be SILENTLY missed (every band
    differs, no collision) while the output contract promises them."""
    need = max_hamming + 1
    if need > bits:
        raise ValueError(
            f"max_hamming={max_hamming} needs {need} bands but simhash has "
            f"only {bits} bits — no banding can cover that radius "
            "(pigeonhole needs bands >= max_hamming + 1, bands <= bits)"
        )
    if bands < need:
        bands = next(b for b in range(need, bits + 1) if bits % b == 0)
    width = bits // bands
    keyed = sims.select(
        "id",
        "simhash",
        F.explode(
            F.expr(
                "array("
                + ",".join(
                    f"named_struct('band', {bi}, 'key', shiftright(simhash, {bi * width}) & {(1 << width) - 1})"
                    for bi in range(bands)
                )
                + ")"
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a = keyed.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"), "band", "key")
    b = keyed.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr("bit_count(sa ^ sb)").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al.,
    arXiv:2303.09540) of an embedding corpus: vectors are clustered by the
    IVF coarse quantizer (similarity.ivf_assign), and WITHIN each cell a
    vector whose cosine to any lower-id cellmate is ≥ ``threshold`` is
    marked a semantic duplicate of its closest such predecessor —
    keep-first semantics, min id survives, same convention as the exact/
    MinHash dedups above.

    Output (id, cell, keep, dup_of, cosine): one row per input vector;
    keep=false rows carry the surviving representative and the cosine that
    condemned them.

    Scale shape: the only quadratic term is within-cell, and n_centroids is
    the dial (SemDeDup itself runs k-means at ~0.1% of corpus size); the
    cell self-join is a plain equi-join AQE can split on a skewed cell, the
    quantizer assign is a broadcast-centroid argmax linear in |N|, and
    nothing touches the driver. ``kmeans_iters`` > 0 tightens the cells
    (DataFrame-native spherical Lloyd — see ivf_assign)."""
    from pyspark.sql import Window

    from .similarity import _dot_expr, ivf_assign

    assigned, _ = ivf_assign(
        emb, n_centroids, id_col, vec_col, kmeans_iters=kmeans_iters
    )
    a = assigned.select("cell", "id", "u")
    b = assigned.select(
        "cell", F.col("id").alias("prev_id"), F.col("u").alias("pu")
    )
    hits = (
        a.join(b, "cell")
        .where(F.col("prev_id") < F.col("id"))
        .withColumn("cosine", F.round(F.expr(_dot_expr("u", "pu")), 5))
        .where(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("prev_id"))
    best = (
        hits.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("id", F.col("prev_id").alias("dup_of"), "cosine")
    )
    res = (
        assigned.select("id", "cell")
        .join(best, "id", "left")
        .withColumn("keep", F.col("dup_of").isNull())
        .select("id", "cell", "keep", "dup_of", "cosine")
    )
    # zero-norm vectors (failed encoder outputs) never enter the unit-
    # vector space, but "one row per input vector" still holds: they come
    # back keep=true with NULL cell/dup_of/cosine — cosine to a zero
    # vector is undefined, so nothing can condemn them as duplicates, and
    # dropping them silently would lose them from keep-side consumers
    missing = emb.select(F.col(id_col).alias("id")).join(
        res.select("id"), "id", "left_anti"
    )
    fields = {f.name: f.dataType for f in res.schema.fields}
    return res.unionByName(
        missing.select(
            "id",
            F.lit(None).cast(fields["cell"]).alias("cell"),
            F.lit(True).alias("keep"),
            F.lit(None).cast(fields["dup_of"]).alias("dup_of"),
            F.lit(None).cast(fields["cosine"]).alias("cosine"),
        )
    )
