"""Measure the reference RSEM EM throughput on this machine (the real CPU
baseline for bench.py, replacing the round-1 provisional estimate).

Generates the bench-scale dataset (same distribution as
rsem_tpu.testing.synthetic_arrays_fast: 1M single-end 100bp reads with
quals, ~2.5 alignments/read, M=20k transcripts of ~2kb), writes it as
transcript FASTA + SAM, runs the reference pipeline
(rsem-synthesis-reference-transcripts + rsem-preref +
rsem-parse-alignments + rsem-build-read-index + rsem-run-em), and times:

  * cached-conprb theta-only EM rounds (EM.cpp E_STEP with
    needCalcConPrb=false, rounds 11+) — per-round wall time from
    timestamped `ROUND = ...` verbose lines;
  * model-update rounds (1-10, conprb recomputed per base);
  * end-to-end rsem-run-em wall clock.

Run with -p 1 and -p 2 (this machine exposes 2 cores). The 16-thread
number in BASELINE.md's ">=10x vs 16-thread CPU RSEM" target is
extrapolated as 16x the single-thread per-round throughput (perfect
linear scaling — the most favorable assumption for the reference; the
measured 1->2 thread efficiency is recorded alongside).

Writes tools/baseline_measured.json, which bench.py reads.

Usage: python tools/measure_baseline.py [workdir]
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

RSEM = os.environ.get("RSEM_BIN", "/root/reference")
WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/baseline_work"

N_READS = 1_000_000
M = 20_000
READ_LEN = 100
TX_LEN = 2000
MEAN_EXTRA = 1.5
SEED = 0

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def gen_dataset():
    """Vectorized tx.fa + SAM generation mirroring synthetic_arrays_fast."""
    rng = np.random.default_rng(SEED)
    os.makedirs(WORK, exist_ok=True)

    lens = rng.integers(max(READ_LEN * 3, TX_LEN // 2), TX_LEN + 1, size=M)
    offs = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    codes = rng.integers(0, 4, size=int(lens.sum()), dtype=np.int64).astype(np.uint8)
    seq_bytes = BASES[codes]

    names = [f"TX{i:05d}" for i in range(M)]
    t0 = time.time()
    with open(f"{WORK}/tx.fa", "wb") as f:
        for i in range(M):
            f.write(b">" + names[i].encode() + b"\n")
            f.write(seq_bytes[offs[i]:offs[i + 1]].tobytes() + b"\n")
    # trivial 1 gene per transcript map
    with open(f"{WORK}/map.txt", "w") as f:
        for n in names:
            f.write(f"G_{n} {n}\n")

    # hits: same distribution as synthetic_arrays_fast (first hit counted,
    # extras Poisson); all alignments random positions (conprb values are
    # arbitrary but E-step round cost is identical)
    n_hits_per = 1 + rng.poisson(MEAN_EXTRA, size=N_READS)
    H = int(n_hits_per.sum())
    rid = np.repeat(np.arange(N_READS, dtype=np.int64), n_hits_per)
    sid = rng.integers(0, M, size=H).astype(np.int64)
    max_pos = lens[sid] - READ_LEN
    pos = (rng.random(H) * (max_pos + 1)).astype(np.int64)
    dirs = rng.integers(0, 2, size=H).astype(np.int8)

    # read sequence = the first alignment's target substring + 0.5% errors
    first_hit = np.zeros(N_READS, dtype=np.int64)
    first_hit[1:] = np.cumsum(n_hits_per)[:-1]
    src = offs[sid[first_hit]] + pos[first_hit]
    gather = src[:, None] + np.arange(READ_LEN)[None, :]
    rcodes = codes[gather]
    err = rng.random((N_READS, READ_LEN)) < 0.005
    rcodes = np.where(err, rng.integers(0, 4, size=(N_READS, READ_LEN)), rcodes)
    # reverse-complement reads whose first alignment is reverse strand
    rev1 = dirs[first_hit] == 1
    rc = rcodes.copy()
    rc[rev1] = 3 - rc[rev1, ::-1]
    seqs = BASES[rc]
    quals = rng.integers(25, 40, size=(N_READS, READ_LEN)).astype(np.uint8) + 33

    print(f"dataset: N={N_READS} H={H} gen={time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    sam = f"{WORK}/aln.sam"
    with open(sam, "w", buffering=1 << 22) as f:
        f.write("@HD\tVN:1.0\n")
        for i in range(M):
            f.write(f"@SQ\tSN:{names[i]}\tLN:{lens[i]}\n")
        seq_strs = seqs.view(f"S{READ_LEN}").ravel()
        qual_strs = quals.view(f"S{READ_LEN}").ravel()
        # reverse-complement lookup for reverse-strand alignment records
        rc_codes = (3 - rc[:, ::-1]).astype(np.uint8)
        rseq_strs = BASES[rc_codes].view(f"S{READ_LEN}").ravel()
        rqual_strs = quals[:, ::-1].copy().view(f"S{READ_LEN}").ravel()
        h = 0
        lines = []
        for r in range(N_READS):
            nh = n_hits_per[r]
            s_f = seq_strs[r].decode()
            q_f = qual_strs[r].decode()
            s_r = rseq_strs[r].decode()
            q_r = rqual_strs[r].decode()
            for k in range(nh):
                flag = (16 if dirs[h] else 0) | (256 if k else 0)
                s, q = (s_r, q_r) if dirs[h] else (s_f, q_f)
                lines.append(
                    f"R{r}\t{flag}\t{names[sid[h]]}\t{pos[h] + 1}\t255\t"
                    f"{READ_LEN}M\t*\t0\t0\t{s}\t{q}\n"
                )
                h += 1
            if len(lines) >= 100_000:
                f.write("".join(lines))
                lines = []
        f.write("".join(lines))
    print(f"SAM written ({os.path.getsize(sam)>>20} MB) in "
          f"{time.time()-t0:.1f}s", flush=True)
    return H


def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run([str(c) for c in cmd], check=True, **kw)


def prep():
    run([f"{RSEM}/rsem-synthesis-reference-transcripts", f"{WORK}/ref", "0",
         "1", f"{WORK}/map.txt", f"{WORK}/tx.fa"])
    run([f"{RSEM}/rsem-preref", f"{WORK}/ref.transcripts.fa", "1",
         f"{WORK}/ref", "-q"])
    os.makedirs(f"{WORK}/s.temp", exist_ok=True)
    os.makedirs(f"{WORK}/s.stat", exist_ok=True)
    imd, stat = f"{WORK}/s.temp/s", f"{WORK}/s.stat/s"
    t0 = time.time()
    run([f"{RSEM}/rsem-parse-alignments", f"{WORK}/ref", imd, stat,
         f"{WORK}/aln.sam", "1", "-q"])
    parse_sec = time.time() - t0
    run([f"{RSEM}/rsem-build-read-index", "32", "1", "0",
         f"{imd}_alignable.fq"])
    with open(f"{imd}.mparams", "w") as f:
        f.write("1 1000\n0.5\n0\n20\n1 1000\n-1 0\n25\n")
    return imd, stat, parse_sec


def time_em(imd, stat, threads):
    """Run rsem-run-em verbose, timestamp each ROUND line."""
    cmd = [f"{RSEM}/rsem-run-em", f"{WORK}/ref", "1", f"{WORK}/s", imd, stat,
           "-p", str(threads)]
    print("+", " ".join(cmd), flush=True)
    t_start = time.time()
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, bufsize=1)
    stamps = []  # (round, wall time since start)
    for line in p.stdout:
        m = re.match(r"ROUND = (\d+)", line)
        if m:
            stamps.append((int(m.group(1)), time.time() - t_start))
    p.wait()
    total = time.time() - t_start
    assert p.returncode == 0, f"rsem-run-em failed rc={p.returncode}"
    rounds = {r: t for r, t in stamps}
    n_rounds = max(rounds)
    # model rounds: 1..10 (EM.cpp:307-310); cached theta rounds: 11..n
    # per-round time = timestamp deltas
    ts = [rounds[r] for r in sorted(rounds)]
    deltas = np.diff([0.0] + ts)
    model_sec = float(deltas[:10].sum())
    theta_deltas = deltas[10:]
    theta_sec = float(theta_deltas.sum())
    theta_per_round = float(np.median(theta_deltas)) if len(theta_deltas) else 0
    return {
        "threads": threads,
        "total_sec": round(total, 3),
        "n_rounds": n_rounds,
        "model_rounds_sec": round(model_sec, 3),
        "theta_rounds": len(theta_deltas),
        "theta_rounds_sec": round(theta_sec, 3),
        "theta_sec_per_round_median": round(theta_per_round, 5),
        "theta_reads_per_sec": round(N_READS / theta_per_round)
        if theta_per_round else None,
    }


def main():
    H = gen_dataset()
    imd, stat, parse_sec = prep()
    res1 = time_em(imd, stat, 1)
    res2 = time_em(imd, stat, 2)
    scal = (res1["theta_sec_per_round_median"] /
            res2["theta_sec_per_round_median"]) / 2
    extrap16 = res1["theta_reads_per_sec"] * 16
    out = {
        "workload": {
            "n_reads": N_READS, "M": M, "read_len": READ_LEN,
            "n_hits": H, "model_type": 1,
        },
        "machine_cores": os.cpu_count(),
        "parse_alignments_sec": round(parse_sec, 2),
        "runs": [res1, res2],
        "scaling_efficiency_1to2": round(scal, 3),
        "ref_theta_reads_per_sec_1thread": res1["theta_reads_per_sec"],
        "ref_theta_reads_per_sec_16thread_linear_extrap": extrap16,
        "ref_em_end_to_end_sec_16thread_linear_extrap": round(
            res1["total_sec"] / 16, 2),
        "note": "16-thread numbers assume perfect linear scaling from the "
                "1-thread measurement (favors the reference); measured "
                "1->2-thread efficiency recorded above.",
    }
    with open("tools/baseline_measured.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
