"""Per-stage checkpointing with lineage metrics and mid-run resume.

The Spark analogue of the reference's make-timestamp DAG (makefile:33-152)
and its append-only label caches (pre_screen_names.R:220-228,
match_addresses.R:151-175), upgraded per the north rule:

- every stage writes its output as parquet under ``<root>/<stage>/`` plus a
  manifest line with an **input fingerprint** (hash of upstream stage
  fingerprints + parameters — the content-addressed version of make's
  timestamps);
- per-partition lineage metrics ``(stage, partition_id, rows)`` and a
  10-bin histogram per score column go to ``<root>/_lineage/``;
- a re-run calls the same ``stage(...)`` sequence; any stage whose
  fingerprint matches the manifest is **skipped** (output read back from
  parquet), so a killed run resumes at the first stage whose inputs
  changed — deterministically, because every upstream stage is seeded.

In production the parquet directory is an Iceberg table and the manifest a
snapshot property; the sandbox uses plain parquet + a JSON-lines manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint(*parts: object) -> str:
    """Stable hash of stage parameters / upstream fingerprints."""
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x1f")
    return h.hexdigest()[:20]


def df_fingerprint(df: DataFrame | None) -> str:
    """Content fingerprint of a (small) side-input table: row count + an
    order-insensitive xor of row hashes. One aggregate job — used so that
    e.g. changed training labels correctly invalidate downstream stages."""
    if df is None:
        return "none"
    row = df.agg(
        F.count("*").alias("c"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({', '.join(df.columns)}))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return f"{row['c']}:{row['h']}"


@dataclass
class StageResult:
    name: str
    df: DataFrame
    fingerprint: str
    skipped: bool
    rows: int
    wall_ms: float


@dataclass
class CheckpointManager:
    root: str
    spark: SparkSession
    results: dict[str, StageResult] = field(default_factory=dict)

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.jsonl")

    def _load_manifest(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        path = self._manifest_path()
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        out[e["stage"]] = e  # later lines win
        return out

    def _append_manifest(self, entry: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        with open(self._manifest_path(), "a") as f:
            f.write(json.dumps(entry) + "\n")

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        *,
        depends_on: list[str] | None = None,
        params: object = None,
        score_cols: list[str] | None = None,
    ) -> DataFrame:
        """Run ``fn`` (or load its checkpoint) as stage ``name``.

        The stage fingerprint chains the fingerprints of ``depends_on``
        stages with ``params``; a manifest hit with the same fingerprint and
        an intact _SUCCESS marker short-circuits to a parquet read.
        """
        dep_fps = [self.results[d].fingerprint for d in (depends_on or [])]
        fp = fingerprint(name, params, *dep_fps)
        out_dir = os.path.join(self.root, name)
        manifest = self._load_manifest()
        entry = manifest.get(name)
        success = os.path.join(out_dir, "_SUCCESS")
        if entry and entry["fingerprint"] == fp and os.path.exists(success):
            df = self.spark.read.parquet(out_dir)
            res = StageResult(name, df, fp, True, entry["rows"], 0.0)
            self.results[name] = res
            return df

        t0 = time.time()
        df = fn()
        df.write.mode("overwrite").parquet(out_dir)
        out = self.spark.read.parquet(out_dir)
        wall_ms = (time.time() - t0) * 1000

        # lineage: per-partition row counts of the materialized output
        part_counts = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(name))
            .select("stage", "partition_id", "rows")
        )
        lineage_dir = os.path.join(self.root, "_lineage", name)
        part_counts.write.mode("overwrite").parquet(os.path.join(lineage_dir, "partitions"))

        # score-distribution metrics: 10-bin histogram per score column
        for col in score_cols or []:
            if col not in out.columns:
                continue
            hist = (
                out.where(F.col(col).isNotNull())
                .select(
                    F.least(F.floor(F.col(col).cast("double") * 10), F.lit(9)).alias("bin")
                )
                .groupBy("bin")
                .agg(F.count("*").alias("n"))
                .withColumn("stage", F.lit(name))
                .withColumn("score", F.lit(col))
                .select("stage", "score", "bin", "n")
            )
            hist.write.mode("overwrite").parquet(
                os.path.join(lineage_dir, f"hist_{col}")
            )

        rows = out.count()
        self._append_manifest(
            {
                "stage": name,
                "fingerprint": fp,
                "rows": rows,
                "wall_ms": round(wall_ms, 1),
                "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        res = StageResult(name, out, fp, False, rows, wall_ms)
        self.results[name] = res
        return out

    def lineage(self, name: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.root, "_lineage", name, "partitions")
        )


def resolve_entities_checkpointed(
    documents: DataFrame,
    ckpt_dir: str,
    addresses: DataFrame | None = None,
    labels: DataFrame | None = None,
    num_trees: int = 100,
    auto_accept: bool = True,
    corpus_fingerprint: object = None,
    **match_kwargs,
):
    """The resolve_entities pipeline staged through a CheckpointManager —
    kill it after any stage and a re-run resumes from the next one.

    ``corpus_fingerprint`` identifies the input data (e.g. a snapshot id or
    path+mtime); it seeds the first stage's fingerprint chain.
    """
    from .operators.address import match_addresses
    from .operators.cc import name_clusters
    from .operators.extract import extract_names
    from .operators.prescreen import pre_screen
    from .pipeline import match_names

    spark = documents.sparkSession
    mgr = CheckpointManager(ckpt_dir, spark)

    names = mgr.stage(
        "extract_names",
        lambda: extract_names(documents),
        params=("v1", corpus_fingerprint),
    )
    master = mgr.stage(
        "match_names",
        lambda: match_names(names.select("name"), **match_kwargs).master,
        depends_on=["extract_names"],
        params=sorted(match_kwargs.items()),
        score_cols=["cosine_similarity", "jw_distance", "token_sim"],
    )
    addr_pairs = (
        mgr.stage(
            "match_addresses",
            lambda: match_addresses(addresses),
            params=("v1", corpus_fingerprint),
        )
        if addresses is not None
        else None
    )
    screened = mgr.stage(
        "pre_screen",
        lambda: pre_screen(
            master,
            addr_pairs,
            names,
            labeled_pairs=labels,
            num_trees=num_trees,
            auto_accept=auto_accept,
        ),
        depends_on=["match_names"]
        + (["match_addresses"] if addresses is not None else []),
        params=(num_trees, auto_accept, df_fingerprint(labels)),
        score_cols=["rf_prob", "importance_dist"],
    )
    clusters = mgr.stage(
        "cluster",
        lambda: name_clusters(screened),
        depends_on=["pre_screen"],
    )
    return mgr, clusters
