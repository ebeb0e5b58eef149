"""Serial scaling-gate runs → a committed machine artifact.

The north rule's two-cluster-size criterion is evidenced in this sandbox by
running the SAME pair-scoring job at several parallelism levels (local[2] /
local[8] / local[32] — the stand-in for N vs 4N executors) and reporting
throughput at each plus scaling efficiency. Single-box efficiency is noisy
(±15%, BENCH/BASELINE.md), so the gate is graded on the MEDIAN of several
serial runs, not a best-of-N: this tool runs ``bench.py --scaling`` N times
back-to-back and writes every run and every cell to a JSON artifact.

Usage::

    python tools/scaling_runs.py [N] [out.json]   # default N=3, SCALING.json
"""

from __future__ import annotations

import json
import statistics
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    n = int(argv[0]) if argv else 3
    out_path = argv[1] if len(argv) > 1 else "SCALING.json"
    from bench import run_scaling

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tools import membw

    runs = []
    for i in range(n):
        # Same-session DRAM envelope bracket for each run: on a shared-host
        # VM the streaming ceiling drifts run to run, and the envelope is
        # the BEST possible 8→32 efficiency any memory-traffic-bound kernel
        # can post (a real 4N-executor cluster adds memory controllers with
        # the cores; this box does not).
        env_bw = {c: membw.measure(c) for c in (2, 8, 32)}
        r = run_scaling(sf_dir)
        q = r["queries"]
        q["dram_gbps_2_8_32"] = [env_bw[2], env_bw[8], env_bw[32]]
        q["envelope_8_to_32"] = round(env_bw[32] / env_bw[8] / 4.0, 3)
        q["algorithmic_efficiency_8_to_32"] = round(
            q["efficiency_8_to_32"] / max(q["envelope_8_to_32"], 1e-9), 3
        )
        runs.append(r)
        print(json.dumps({"run": i + 1, **q}), flush=True)
    med_8_32 = statistics.median(r["queries"]["efficiency_8_to_32"] for r in runs)
    med_2_8 = statistics.median(r["queries"]["efficiency_2_to_8"] for r in runs)
    med_env = statistics.median(r["queries"]["envelope_8_to_32"] for r in runs)
    artifact = {
        "metric": "scaling_efficiency_8_to_32_median",
        "value": round(med_8_32, 3),
        "unit": "ratio",
        "n_runs": n,
        "median_efficiency_2_to_8": round(med_2_8, 3),
        "median_efficiency_8_to_32": round(med_8_32, 3),
        "median_dram_envelope_8_to_32": round(med_env, 3),
        "gate": {"threshold": 0.8, "met_2_to_8": med_2_8 >= 0.8,
                 "met_8_to_32": med_8_32 >= 0.8,
                 "met_8_to_32_vs_envelope": med_8_32 >= min(0.8, med_env)},
        "runs": [r["queries"] for r in runs],
        "note": "serial runs on one box; local[2]/local[8]/local[32] stand in "
        "for N vs 4N executors (no real cluster in the sandbox). Each run is "
        "bracketed by a same-session DRAM streaming measurement: "
        "envelope_8_to_32 is the hardware ceiling for any memory-bound "
        "kernel's 8→32 efficiency on this box that day, and "
        "algorithmic_efficiency_8_to_32 = measured / envelope.",
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
