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
    """Content fingerprint of a (small) side-input table: row count, an
    order-insensitive xor of row hashes, AND a multiplicity-sensitive
    mod-prime sum of the same hashes. One aggregate job — used so that
    e.g. changed training labels correctly invalidate downstream stages.

    The sum term exists because xor alone cancels on duplicate-row
    multiplicity ({A, A, B} and {B, B, B} share count=3 and xor=B); the
    bounded summands (< 2²⁰ each) keep the bigint sum overflow-free to
    ~10¹² rows — far beyond any side-input this guards."""
    if df is None:
        return "none"
    cols = ", ".join(df.columns)
    row = df.agg(
        F.count("*").alias("c"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({cols}))"), F.lit(0)).alias("h"),
        F.coalesce(F.expr(f"sum(pmod(xxhash64({cols}), 1000003))"), F.lit(0)).alias("s"),
    ).collect()[0]
    return f"{row['c']}:{row['h']}:{row['s']}"


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
    """``num_buckets`` sizes every bucketed stage this manager writes; it is
    part of each bucketed stage's LAYOUT, which is part of the stage
    fingerprint — changing it therefore re-runs every bucketed stage and
    its downstream chain (a checkpoint written under a different layout
    must not satisfy a resume that plans zero-Exchange joins against this
    one). Mixing bucket counts across stages that join each other forfeits
    the zero-exchange plan."""

    root: str
    spark: SparkSession
    num_buckets: int = 32
    results: dict[str, StageResult] = field(default_factory=dict)

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.jsonl")

    def _table_name(self, stage: str) -> str:
        """Catalog table name for a bucketed stage — unique per checkpoint
        root (two concurrent runs over different roots never collide) and
        stable across sessions (a resume in a fresh session re-registers the
        same name over the same files)."""
        digest = hashlib.sha256(os.path.abspath(self.root).encode()).hexdigest()[:10]
        return f"nm_ckpt_{digest}_{stage}"

    def _register_bucketed(self, entry: dict, out_dir: str) -> DataFrame:
        """Re-attach a bucketed stage's files to the session catalog.

        Bucket layout lives in table METADATA, not in the parquet files —
        a plain ``read.parquet`` of a bucketed directory silently loses the
        layout and every downstream join re-shuffles. On resume in a fresh
        session (in-memory catalog, empty) we re-issue the CREATE TABLE DDL
        recorded in the manifest over the existing files; same-session hits
        find the table already registered.
        """
        tbl = entry["table"]
        if not self.spark.catalog.tableExists(tbl):
            cols = ", ".join(entry["bucket_by"])
            sort = (
                f" SORTED BY ({', '.join(entry['sort_by'])})"
                if entry.get("sort_by")
                else ""
            )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({entry['schema_ddl']}) USING PARQUET "
                f"CLUSTERED BY ({cols}){sort} INTO {entry['num_buckets']} BUCKETS "
                f"LOCATION '{out_dir}'"
            )
        return self.spark.table(tbl)

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
        bucket_by: list[str] | None = None,
        sort_by: list[str] | None = None,
    ) -> DataFrame:
        """Run ``fn`` (or load its checkpoint) as stage ``name``.

        The stage fingerprint chains the fingerprints of ``depends_on``
        stages with ``params``; a manifest hit with the same fingerprint,
        an intact _SUCCESS marker, AND a matching in-directory _FINGERPRINT
        file short-circuits to a parquet read. The _FINGERPRINT file is
        written LAST in the stage commit, so a run that overwrote the data
        but crashed before committing can never be served as a cache hit
        for a fingerprint the data does not actually carry (the manifest
        alone cannot guarantee that — it describes the PREVIOUS completed
        write, not whatever is on disk now).

        ``bucket_by`` materializes the stage BUCKETED by those columns
        (io.write_bucketed rationale): the shuffle on the stage's join key
        happens once at write time, and every downstream/resume-path join
        between stages bucketed on the same key plans with zero Exchange —
        at 100 TB the canonical pair key stops being re-shuffled at every
        stage boundary that crosses a resume. ``sort_by`` additionally sorts
        within buckets so sort-merge joins skip their sort.
        """
        dep_fps = [self.results[d].fingerprint for d in (depends_on or [])]
        # bucket layout is part of the stage identity: a checkpoint written
        # unbucketed (or with different bucket columns / counts) must NOT
        # satisfy a resume that expects zero-Exchange joins on this layout —
        # a silent plain-parquet hit would permanently diverge fresh vs
        # resumed physical plans.
        layout = (
            {"bucket_by": list(bucket_by), "sort_by": list(sort_by or []),
             "num_buckets": self.num_buckets}
            if bucket_by
            else None
        )
        fp = fingerprint(name, params, layout, *dep_fps)
        out_dir = os.path.join(self.root, name)
        manifest = self._load_manifest()
        entry = manifest.get(name)
        success = os.path.join(out_dir, "_SUCCESS")
        fp_file = os.path.join(out_dir, "_FINGERPRINT")
        disk_fp = None
        if os.path.exists(fp_file):
            with open(fp_file) as f:
                disk_fp = f.read().strip()
        if (
            entry
            and entry["fingerprint"] == fp
            and os.path.exists(success)
            and disk_fp == fp
        ):
            if entry.get("bucket_by"):
                df = self._register_bucketed(entry, out_dir)
            else:
                df = self.spark.read.parquet(out_dir)
            res = StageResult(name, df, fp, True, entry["rows"], 0.0)
            self.results[name] = res
            return df

        t0 = time.time()
        df = fn()
        if bucket_by:
            from .io import write_bucketed

            tbl = self._table_name(name)
            self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            write_bucketed(
                df, tbl, list(bucket_by), self.num_buckets,
                sort_cols=list(sort_by) if sort_by else None, path=out_dir,
            )
            out = self.spark.table(tbl)
        else:
            df.write.mode("overwrite").parquet(out_dir)
            out = self.spark.read.parquet(out_dir)
        wall_ms = (time.time() - t0) * 1000

        # lineage: per-partition row counts of the materialized output —
        # collected once (one scan) and written back from the driver, which
        # also serves the manifest row total without a second full scan
        part_rows = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        lineage_dir = os.path.join(self.root, "_lineage", name)
        self.spark.createDataFrame(
            [(name, r["partition_id"], r["rows"]) for r in part_rows],
            "stage string, partition_id int, rows bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(lineage_dir, "partitions")
        )

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

        rows = int(sum(r["rows"] for r in part_rows))
        # the stage commit point: data + lineage + metrics are all on disk;
        # the _FINGERPRINT file makes the directory self-describing (see
        # docstring) and the manifest line makes the hit findable
        with open(fp_file, "w") as f:
            f.write(fp)
        mentry = {
            "stage": name,
            "fingerprint": fp,
            "rows": rows,
            "wall_ms": round(wall_ms, 1),
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if bucket_by:
            mentry.update(
                {
                    "bucket_by": bucket_by,
                    "sort_by": sort_by or [],
                    "num_buckets": self.num_buckets,
                    "table": self._table_name(name),
                    # layout metadata needed to re-register the table in a
                    # fresh session's (empty, in-memory) catalog on resume
                    "schema_ddl": ", ".join(
                        f"`{f.name}` {f.dataType.simpleString()}"
                        for f in out.schema.fields
                    ),
                }
            )
        self._append_manifest(mentry)
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
    # the pair-keyed stages materialize bucketed by the canonical pair key
    # (and clusters by name): master⋈screened on resume, screened⋈clusters
    # feeds, and merge_labels-style joins all reuse the write-time layout
    # with zero Exchange (plan-asserted in tests/test_checkpoint.py)
    _mn_results: list = []

    def _build_master() -> DataFrame:
        res = match_names(names.select("name"), **match_kwargs)
        _mn_results.append(res)
        return res.master

    master = mgr.stage(
        "match_names",
        _build_master,
        depends_on=["extract_names"],
        params=sorted(match_kwargs.items()),
        score_cols=["cosine_similarity", "jw_distance", "token_sim"],
        bucket_by=["name", "match"],
        sort_by=["name", "match"],
    )
    # the stage just wrote master to parquet (or skipped — list empty), so
    # the run's pinned weights/parse tables are releasable now
    for res in _mn_results:
        res.release()
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
        bucket_by=["name", "match"],
        sort_by=["name", "match"],
    )
    clusters = mgr.stage(
        "cluster",
        lambda: name_clusters(screened),
        depends_on=["pre_screen"],
        bucket_by=["name"],
        sort_by=["name"],
    )
    return mgr, clusters
