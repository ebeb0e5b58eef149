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
    runs = []
    for i in range(n):
        r = run_scaling(sf_dir)
        runs.append(r)
        print(json.dumps({"run": i + 1, **r["queries"]}), flush=True)
    med_8_32 = statistics.median(r["queries"]["efficiency_8_to_32"] for r in runs)
    med_2_8 = statistics.median(r["queries"]["efficiency_2_to_8"] for r in runs)
    artifact = {
        "metric": "scaling_efficiency_8_to_32_median",
        "value": round(med_8_32, 3),
        "unit": "ratio",
        "n_runs": n,
        "median_efficiency_2_to_8": round(med_2_8, 3),
        "median_efficiency_8_to_32": round(med_8_32, 3),
        "gate": {"threshold": 0.8, "met_2_to_8": med_2_8 >= 0.8,
                 "met_8_to_32": med_8_32 >= 0.8},
        "runs": [r["queries"] for r in runs],
        "note": "serial runs on one box; local[2]/local[8]/local[32] stand in "
        "for N vs 4N executors (no real cluster in the sandbox)",
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
