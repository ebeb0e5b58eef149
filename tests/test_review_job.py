"""Review-loop job wiring: emit pending pairs ordered by importance,
ingest hand labels never-overwrite, progress summary (reference
pre_screen_names.R:198,226 + name_matching_summary.Rmd)."""

import importlib.util
import json
import os


def _load_job():
    path = os.path.join(os.path.dirname(__file__), "..", "jobs", "review_job.py")
    spec = importlib.util.spec_from_file_location("review_job", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_review_loop(spark, tmp_path, capsys):
    job = _load_job()
    ckpt = tmp_path / "ckpt"
    screened = spark.createDataFrame(
        [
            ("A CO", "A CORP", 0.0, 0.9, None),
            ("B LLC", "B LTD", 2.5, 0.4, None),
            ("C INC", "C CO", 0.0, 0.95, 1.0),   # already decided
        ],
        "name string, match string, importance_dist double, rf_prob double, keep double",
    )
    screened.write.parquet(str(ckpt / "pre_screen"))

    # emit: only undecided pairs, most important (dist 0) first
    out_dir = str(tmp_path / "review1")
    job.main(["emit", "--checkpoint", str(ckpt), "--out", out_dir])
    emitted = spark.read.option("header", True).csv(out_dir).collect()
    assert [r["name"] for r in emitted] == ["A CO", "B LLC"]

    # human fills keep for the first pair → ingest
    store = str(tmp_path / "labels")
    reviewed1 = str(tmp_path / "done1")
    spark.createDataFrame(
        [("A CO", "A CORP", "1"), ("B LLC", "B LTD", None)],
        "name string, match string, keep string",
    ).coalesce(1).write.option("header", True).csv(reviewed1)
    job.main(["ingest", "--reviewed", reviewed1, "--labels-store", store])

    # a later conflicting import must NOT overwrite the earlier decision
    reviewed2 = str(tmp_path / "done2")
    spark.createDataFrame(
        [("A CO", "A CORP", "0"), ("B LLC", "B LTD", "0")],
        "name string, match string, keep string",
    ).coalesce(1).write.option("header", True).csv(reviewed2)
    job.main(["ingest", "--reviewed", reviewed2, "--labels-store", store])
    from name_matching_spark.io import read_merged

    labels = {
        (r["name"], r["match"]): r["keep"]
        for r in read_merged(spark, os.path.join(store, "labels")).collect()
    }
    assert labels[("A CO", "A CORP")] == 1.0  # first decision wins
    assert labels[("B LLC", "B LTD")] == 0.0  # new pair accepted
    # crash-safety shape: the committed store is a gen=<n> snapshot; a
    # leftover scratch dir from a crashed merge must not shadow it
    gens = sorted(os.listdir(os.path.join(store, "labels")))
    assert any(g.startswith("gen=") for g in gens)
    assert not any(g.startswith("_merging") for g in gens)

    # summary: modeled stage gates on importance_dist == 0
    capsys.readouterr()
    job.main(["summary", "--checkpoint", str(ckpt)])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    by_stage = {r["stage"]: r for r in report["review_summary"]}
    assert by_stage["modeled"]["n_total"] == 2      # the two dist-0 pairs
    assert by_stage["modeled"]["n_reviewed"] == 1   # C INC decided
    assert by_stage["all_pairs"]["n_pending"] == 2


def test_incremental_job_seed_and_refresh(spark, tmp_path, capsys):
    # lambda batch side as a job: seed the generation store from a "full
    # resolve" output, refresh with a frontier of new names, and the store
    # advances a generation with the newcomer clustered via the rep.
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "jobs", "incremental_job.py")
    spec = importlib.util.spec_from_file_location("incremental_job", path)
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    seed_pq = str(tmp_path / "seed.parquet")
    spark.createDataFrame(
        [
            ("MERKAVDI OPERATING", 1, "MERKAVDI ENERGY"),
            ("ZELBONKA OIL", 2, "ZELBONKA HOLDINGS"),
        ],
        "name string, cluster long, group_name string",
    ).write.parquet(seed_pq)
    new_pq = str(tmp_path / "new.parquet")
    spark.createDataFrame([("MERKAVDO ENERGY",)], "name string").write.parquet(new_pq)
    store = str(tmp_path / "clusters_store")

    job.main(["--seed", seed_pq, "--clusters-store", store])
    capsys.readouterr()
    rc = job.main(["--new-names", new_pq, "--clusters-store", store])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_names"] == 1

    from name_matching_spark.io import read_merged

    rows = {r["name"]: r["group_name"] for r in read_merged(spark, store).collect()}
    assert rows["MERKAVDO ENERGY"] == "MERKAVDI ENERGY"
    assert rows["MERKAVDI OPERATING"] == "MERKAVDI ENERGY"
    assert rows["ZELBONKA OIL"] == "ZELBONKA HOLDINGS"
