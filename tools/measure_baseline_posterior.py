"""Measure the reference's posterior stages (rsem-run-gibbs and
rsem-calculate-credibility-intervals) on this host, at the bench workload
(the r3 verdict's ask: BASELINE configs 4-5 had no reference wall-clocks).

Reuses tools/measure_baseline.py's dataset/prep machinery, adds a
--gibbs-out rsem-run-em pass to produce the .ofg, then times:

  * rsem-run-gibbs ref imd stat 200 1000 1 [-p N]     (driver defaults,
    rsem-calculate-expression:18-20; Gibbs.cpp:265-353)
  * rsem-calculate-credibility-intervals ref imd stat 0.95 1000 50 1024
    [-p N]                                            (calcCI.cpp defaults)

Merges {"gibbs": ..., "ci": ...} into tools/baseline_measured.json, which
bench.py reads for its gibbs_vs_ref_1t / ci_vs_ref_1t details.

Usage: RSEM_BIN=/tmp/refbuild python tools/measure_baseline_posterior.py [workdir]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
import measure_baseline as mb  # noqa: E402

RSEM = mb.RSEM
WORK = mb.WORK


def timed(cmd):
    print("+", " ".join(map(str, cmd)), flush=True)
    t0 = time.time()
    subprocess.run([str(c) for c in cmd], check=True)
    return round(time.time() - t0, 2)


def main():
    imd, stat = f"{WORK}/s.temp/s", f"{WORK}/s.stat/s"
    if not os.path.exists(f"{imd}.mparams"):
        mb.gen_dataset()
        imd, stat, _ = mb.prep()
    # EM with --gibbs-out -> .ofg for the sampler (EM.cpp:422-458)
    em_sec = timed([f"{RSEM}/rsem-run-em", f"{WORK}/ref", "1", f"{WORK}/s",
                    imd, stat, "-p", "2", "--gibbs-out", "-q"])

    gibbs = {}
    ci = {}
    for p in (1, 2):
        gibbs[f"total_sec_{p}t"] = timed(
            [f"{RSEM}/rsem-run-gibbs", f"{WORK}/ref", imd, stat,
             "200", "1000", "1", "-p", str(p), "--seed", "0", "-q"])
        ci[f"total_sec_{p}t"] = timed(
            [f"{RSEM}/rsem-calculate-credibility-intervals", f"{WORK}/ref",
             imd, stat, "0.95", "1000", "50", "1024", "-p", str(p),
             "--seed", "0", "-q"])
    gibbs["params"] = {"burnin": 200, "nsamples": 1000, "gap": 1}
    ci["params"] = {"confidence": 0.95, "nCV": 1000, "nSpC": 50}

    path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    with open(path) as f:
        d = json.load(f)
    d["gibbs"] = gibbs
    d["ci"] = ci
    d["em_gibbs_out_sec_2t"] = em_sec
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    print(json.dumps({"gibbs": gibbs, "ci": ci}, indent=1))


if __name__ == "__main__":
    main()
