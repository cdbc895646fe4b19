"""One honest user-visible wall-clock: rsem-calculate-expression
end-to-end (SAM parse -> EM -> results) at the bench workload, against the
reference's measured parse+EM on this host (11.18s + 34.28s at 1 thread;
tools/baseline_measured.json).

Reuses tools/measure_baseline.py's generator so the SAM is byte-identical
in distribution to what the reference was timed on. Writes
tools/bench_full_pipeline.json.

Usage: python tools/bench_full_pipeline.py [workdir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import measure_baseline as mb  # noqa: E402

WORK = mb.WORK


def main():
    sam = f"{WORK}/aln.sam"
    if not os.path.exists(sam):
        mb.gen_dataset()

    from rsem_tpu.refprep.prepare import PrepareConfig, prepare_reference

    os.makedirs(f"{WORK}/tpu", exist_ok=True)
    os.chdir(f"{WORK}/tpu")
    refname = "ref_tpu"
    if not os.path.exists(f"{refname}.ti"):
        t0 = time.time()
        prepare_reference(
            [f"{WORK}/tx.fa"], refname,
            PrepareConfig(transcript_to_gene_map=f"{WORK}/map.txt"),
        )
        print(f"prepare-reference: {time.time()-t0:.1f}s", flush=True)

    from rsem_tpu.pipeline.calculate_expression import main as calc_main

    # --no-bam-output: the reference comparator (parse+EM) excludes BAM
    # writeback; the posterior-BAM write was measured separately (72.9s
    # r4 first run, io/bam_writer.py)
    def run_once():
        t0 = time.time()
        calc_main(["--alignments", sam, refname, "bench_s", "--time",
                   "--no-bam-output"])
        return round(time.time() - t0, 2)

    def read_stages():
        # per-stage lines are the '# <name>: <secs> s.' comments
        # (utils/timing.write_time_file) — r4 parsed the wrong format and
        # committed an empty stages_sec
        timing = {}
        if os.path.exists("bench_s.time"):
            for line in open("bench_s.time"):
                if line.startswith("# ") and line.rstrip().endswith(" s."):
                    name, val = line[2:].rsplit(":", 1)
                    timing[name.strip()] = float(val.split()[0])
        return timing

    cold = run_once()
    stages_cold = read_stages()
    warm = run_once()
    total = warm
    timing = read_stages()
    base = {}
    bl = os.path.join(os.path.dirname(mb.__file__),
                      "baseline_measured.json")
    if os.path.exists(bl):
        with open(bl) as f:
            d = json.load(f)
        base = {
            "ref_parse_sec": d.get("parse_alignments_sec"),
            "ref_em_1t_sec": d["runs"][0]["total_sec"],
            "ref_parse_plus_em_1t_sec": round(
                d.get("parse_alignments_sec", 0)
                + d["runs"][0]["total_sec"], 2),
        }
    out = {
        "pipeline_total_sec": round(total, 2),
        "pipeline_cold_sec": cold,
        "stages_sec": timing,
        "stages_cold_sec": stages_cold,
        "reference": base,
        "vs_ref_parse_plus_em_1t": round(
            base.get("ref_parse_plus_em_1t_sec", 0) / total, 2
        ) if base else None,
        "workload": "1M single-end 100bp qual reads, ~2.5 aln/read, M=20k",
    }
    for d in ("", "artifacts_r5"):
        p = os.path.join(os.path.dirname(mb.__file__), d,
                         "bench_full_pipeline.json")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
