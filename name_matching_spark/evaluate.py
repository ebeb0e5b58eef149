"""Pairwise-F1 evaluation of entity clusters against ground truth.

The north-rule metric: pairwise F1 ≥ 0.99 vs the reference's match decisions
*at the same blocking key* — truth pairs are restricted to pairs that share
a blocking key (i.e. were candidates at all), mirroring how the reference's
decisions only exist for pairs its matchers surfaced.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.normalize import canonical_pair


def truth_pairs(truth: DataFrame) -> DataFrame:
    """(name, match) canonical same-entity pairs from truth_clusters
    (name, entity_id)."""
    a = truth.select(F.col("entity_id"), F.col("name").alias("_na"))
    b = truth.select(F.col("entity_id"), F.col("name").alias("_nb"))
    return (
        a.join(b, "entity_id")
        .where(F.col("_na") < F.col("_nb"))
        .select(F.col("_na").alias("name"), F.col("_nb").alias("match"))
        .distinct()
    )


def cluster_pairs(clusters: DataFrame) -> DataFrame:
    """(name, match) canonical pairs implied by (name, group_name) clusters —
    including the representative node itself."""
    full = clusters.select("name", "group_name").unionByName(
        clusters.select(F.col("group_name").alias("name"), "group_name")
    ).distinct()
    a = full.select("group_name", F.col("name").alias("_na"))
    b = full.select("group_name", F.col("name").alias("_nb"))
    return (
        a.join(b, "group_name")
        .where(F.col("_na") < F.col("_nb"))
        .select(F.col("_na").alias("name"), F.col("_nb").alias("match"))
        .distinct()
    )


@dataclass
class F1Result:
    tp: int
    fp: int
    fn: int
    # surface-restricted true positives for the RECALL side: when a surface
    # restriction is in play, recall must count tp and fn against the SAME
    # truth population (surface-restricted truth) — counting tp against the
    # full truth set while fn is surface-restricted would let transitively
    # recovered out-of-surface pairs inflate recall past 1-of-any-fixed-set
    # (ADVICE r2). None when no surface was given (tp is the recall tp then).
    tp_recall: int | None = None
    # the same counts with NO surface restriction anywhere (None when no
    # surface was given — the two metrics coincide then)
    unrestricted: "F1Result | None" = None

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if self.tp + self.fp else 1.0

    @property
    def recall(self) -> float:
        tp = self.tp if self.tp_recall is None else self.tp_recall
        return tp / (tp + self.fn) if tp + self.fn else 1.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if p + r else 0.0


def pairwise_f1(
    predicted: DataFrame,
    truth: DataFrame,
    blocked: DataFrame | None = None,
) -> F1Result:
    """``predicted``/``truth``/``blocked`` are canonical (name, match) pair
    DataFrames. The surface restriction (the "same blocking key" clause)
    applies to the RECALL side only: truth pairs outside the blocking
    surface were never candidates for either engine, so they don't count as
    misses. The PREDICTED side is never restricted — a transitive pair
    produced by a wrongly-merged cluster counts as a false positive even
    when it lies outside the candidate surface, so cluster-level merge
    errors stay visible (ADVICE r1). ``.unrestricted`` carries the fully
    unrestricted counts for side-by-side reporting."""
    t_full = truth.select("name", "match").distinct()
    p = predicted.select("name", "match").distinct()
    tp = p.join(t_full, ["name", "match"], "left_semi").count()
    fp = p.join(t_full, ["name", "match"], "left_anti").count()
    fn_full = t_full.join(p, ["name", "match"], "left_anti").count()
    if blocked is None:
        return F1Result(tp=tp, fp=fp, fn=fn_full)
    surface = blocked.select("name", "match")
    t_surf = t_full.join(surface, ["name", "match"], "left_semi")
    fn = t_surf.join(p, ["name", "match"], "left_anti").count()
    tp_surf = p.join(t_surf, ["name", "match"], "left_semi").count()
    return F1Result(
        tp=tp, fp=fp, fn=fn, tp_recall=tp_surf,
        unrestricted=F1Result(tp=tp, fp=fp, fn=fn_full),
    )
