"""Measure native BAM ingestion throughput (records/s) vs the Python path.

Generates a synthetic single-end BAM (multireads, unmapped/filtered reads)
with the repo's own codec, then times rsem_tpu.io.sam.parse_alignments with
and without the native sidecar. Target (VERDICT item 3): >= 1M records/s
native.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from rsem_tpu.io.bamio import BamHeader, BamRec, BamRecWriter, reg2bin
from rsem_tpu.io.sam import parse_alignments

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
NIB = {65: 1, 67: 2, 71: 4, 84: 8}


def make_bam(path, n_reads=1_000_000, M=2000, read_len=100, mean_hits=2.5,
             frac_n0=0.02, seed=0):
    rng = np.random.default_rng(seed)
    names = [f"t{i}" for i in range(M)]
    lens = [2000] * M
    header = BamHeader("@HD\tVN:1.0\n", names, lens)
    n_rec = 0
    with BamRecWriter(path, header, level=1) as w:
        for i in range(n_reads):
            seq = BASES[rng.integers(0, 4, size=read_len)].tobytes().decode()
            qual = "I" * read_len
            name = f"r{i}"
            if rng.random() < frac_n0:
                rec = BamRec.from_sam_fields(
                    [name, "4", "*", "0", "0", "*", "*", "0", "0", seq, qual],
                    header.tid_map(),
                )
                w.write(rec)
                n_rec += 1
                continue
            k = min(1 + rng.geometric(1.0 / (mean_hits - 1.0 + 1e-9)), 20) \
                if mean_hits > 1 else 1
            tids = rng.integers(0, M, size=int(k))
            for j, tid in enumerate(tids):
                flag = 0 if (i + j) % 3 else 16
                pos = int(rng.integers(0, 2000 - read_len))
                rec = BamRec.from_sam_fields(
                    [name, str(flag), names[tid], str(pos + 1), "0",
                     f"{read_len}M", "*", "0", "0", seq, qual],
                    header.tid_map(),
                )
                w.write(rec)
                n_rec += 1
    return n_rec


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = f"/tmp/bench_ingest_{n_reads}.bam"
    meta = path + ".nrec"
    if os.path.exists(path) and os.path.exists(meta):
        n_rec = int(open(meta).read())
        print(f"reusing cached {path} ({n_rec} records)")
    else:
        print(f"generating {n_reads} reads ...", flush=True)
        t0 = time.perf_counter()
        n_rec = make_bam(path, n_reads=n_reads)
        with open(meta, "w") as f:
            f.write(str(n_rec))
        print(f"  {n_rec} records written in {time.perf_counter()-t0:.1f}s")

    names = [""] + [f"t{i}" for i in range(2000)]
    t0 = time.perf_counter()
    b_nat = parse_alignments(path, names, 1, False, 25, use_native=True)
    dt_nat = time.perf_counter() - t0
    print(f"native: {dt_nat:.2f}s = {n_rec/dt_nat/1e6:.2f}M rec/s "
          f"({b_nat.cnt.N1} N1, {b_nat.cnt.n_hits} hits)")

    if n_reads <= 2_000_000:
        t0 = time.perf_counter()
        b_py = parse_alignments(path, names, 1, False, 25, use_native=False)
        dt_py = time.perf_counter() - t0
        print(f"python: {dt_py:.2f}s = {n_rec/dt_py/1e6:.3f}M rec/s; "
              f"speedup {dt_py/dt_nat:.1f}x")


if __name__ == "__main__":
    main()
