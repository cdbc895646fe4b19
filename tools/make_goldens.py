"""Generate golden parity fixtures by running the *reference* RSEM binaries
on synthetic data, for tests/test_parity.py.

Usage: RSEM_BIN=/tmp/rsem-build python tools/make_goldens.py [outdir]

Produces under tests/goldens/:
  tx.fa, map.txt, aln.sam.gz            inputs (shared with our pipeline)
  ref.{ti,grp,seq,transcripts.fa}       reference-built artifacts
  golden.{isoforms,genes}.results       reference EM outputs
  golden.model / golden.theta / golden.cnt
  golden_pme.{isoforms,genes}.results   with --calc-pme style Gibbs columns
"""

import gzip
import os
import subprocess
import sys

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "tests/goldens"
RSEM = os.environ.get("RSEM_BIN", "/tmp/rsem-build")

rng = np.random.default_rng(20260817)

# ---- synthetic transcriptome: 60 transcripts, 20 genes, shared prefixes ----
BASES = np.array(list("ACGT"))


def rand_seq(n):
    return "".join(rng.choice(BASES, n))


genes = []
tx = {}
t2g = {}
for g in range(20):
    gid = f"G{g:03d}"
    n_iso = int(rng.integers(1, 5))
    core = rand_seq(int(rng.integers(300, 700)))
    for i in range(n_iso):
        tid = f"T{g:03d}.{i}"
        # isoforms share the gene core plus unique flanks
        uniq5 = rand_seq(int(rng.integers(0, 200)))
        uniq3 = rand_seq(int(rng.integers(0, 200)))
        seq = uniq5 + core + uniq3
        tx[tid] = seq
        t2g[tid] = gid

os.makedirs(OUT, exist_ok=True)
with open(f"{OUT}/tx.fa", "w") as f:
    for tid, seq in tx.items():
        f.write(f">{tid}\n{seq}\n")
with open(f"{OUT}/map.txt", "w") as f:
    for tid, gid in t2g.items():
        f.write(f"{t2g[tid]} {tid}\n")

# ---- reads: 6000 single-end 50bp with quals, multi-mapped, both strands ----
READ_LEN = 50
N_READS = 6000
N_UNALIGNED = 120

tids = list(tx.keys())
lens = np.array([len(tx[t]) for t in tids])
expr = rng.dirichlet(np.full(len(tids), 0.4)) * lens / lens.mean()
expr /= expr.sum()

COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(s):
    return s.translate(COMP)[::-1]


sam_lines = []
for tid_idx in range(len(tids)):
    pass
for r in range(N_READS):
    ti = rng.choice(len(tids), p=expr)
    seq = tx[tids[ti]]
    pos = int(rng.integers(0, len(seq) - READ_LEN + 1))
    frag = seq[pos : pos + READ_LEN]
    direction = int(rng.integers(0, 2))
    read = frag if direction == 0 else revcomp(frag)
    # sequencing errors at ~0.3%
    read_arr = np.array(list(read))
    err = rng.random(READ_LEN) < 0.003
    read_arr[err] = rng.choice(BASES, err.sum())
    read = "".join(read_arr)
    qual = "".join(chr(33 + q) for q in rng.integers(25, 40, READ_LEN))
    # find all alignments of the ERROR-FREE fragment (aligner-like, exact)
    hits = []
    for tj, t2 in enumerate(tids):
        start = 0
        while True:
            p2 = tx[t2].find(frag, start)
            if p2 < 0:
                break
            hits.append((t2, p2))
            start = p2 + 1
    first = True
    for tname, p2 in hits:
        if direction == 0:
            flag = 0 if first else 256
            s_out, q_out, sam_pos = read, qual, p2
        else:
            flag = 16 | (0 if first else 256)
            s_out, q_out = revcomp(read), qual[::-1]
            sam_pos = p2
        sam_lines.append(
            f"R{r}\t{flag}\t{tname}\t{sam_pos + 1}\t255\t{READ_LEN}M\t*\t0\t0\t"
            f"{s_out}\t{q_out}"
        )
        first = False
for r in range(N_UNALIGNED):
    read = rand_seq(READ_LEN)
    qual = "".join(chr(33 + q) for q in rng.integers(25, 40, READ_LEN))
    sam_lines.append(f"U{r}\t4\t*\t0\t0\t*\t*\t0\t0\t{read}\t{qual}")

header = ["@HD\tVN:1.0"]
for tid in tids:
    header.append(f"@SQ\tSN:{tid}\tLN:{len(tx[tid])}")
with gzip.open(f"{OUT}/aln.sam.gz", "wt") as f:
    f.write("\n".join(header + sam_lines) + "\n")


def run(cmd, **kw):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True, **kw)


# ---- reference pipeline ----
cwd = os.path.abspath(OUT)
run([f"{RSEM}/rsem-synthesis-reference-transcripts", f"{cwd}/ref", "1", "1",
     f"{cwd}/map.txt", f"{cwd}/tx.fa"], cwd=cwd)
run([f"{RSEM}/rsem-preref", f"{cwd}/ref.transcripts.fa", "1", f"{cwd}/ref"],
    cwd=cwd)

# decompress SAM for htslib
import shutil
with gzip.open(f"{OUT}/aln.sam.gz", "rb") as fi, open(f"{OUT}/aln.sam", "wb") as fo:
    shutil.copyfileobj(fi, fo)

os.makedirs(f"{OUT}/golden.temp", exist_ok=True)
os.makedirs(f"{OUT}/golden.stat", exist_ok=True)
imd = f"{cwd}/golden.temp/golden"
stat = f"{cwd}/golden.stat/golden"
run([f"{RSEM}/rsem-parse-alignments", f"{cwd}/ref", imd, stat,
     f"{cwd}/aln.sam", "1", "-q"], cwd=cwd)
run([f"{RSEM}/rsem-build-read-index", "32", "1", "0", f"{imd}_alignable.fq"],
    cwd=cwd)
with open(f"{imd}.mparams", "w") as f:
    f.write("1 1000\n0.5\n0\n20\n1 1000\n-1 0\n25\n")
run([f"{RSEM}/rsem-run-em", f"{cwd}/ref", "1", f"{cwd}/golden", imd, stat,
     "-p", "4", "-q", "--gibbs-out"], cwd=cwd)

# collect per-stage outputs like rsem_perl_utils.collectResults (transpose)
def collect(inp, out, titles):
    rows = [l.rstrip("\n").split("\t") for l in open(inp)]
    ncol = len(rows[0])
    with open(out, "w") as f:
        f.write("\t".join(titles[: len(rows)]) + "\n")
        for c in range(ncol):
            f.write("\t".join(rows[r][c] for r in range(len(rows))) + "\n")


iso_titles = ["transcript_id", "gene_id", "length", "effective_length",
              "expected_count", "TPM", "FPKM", "IsoPct"]
gene_titles = ["gene_id", "transcript_id(s)", "length", "effective_length",
               "expected_count", "TPM", "FPKM"]
collect(f"{imd}.iso_res", f"{cwd}/golden.isoforms.results", iso_titles)
collect(f"{imd}.gene_res", f"{cwd}/golden.genes.results", gene_titles)

# Gibbs golden (seeded)
run([f"{RSEM}/rsem-run-gibbs", f"{cwd}/ref", imd, stat, "50", "400", "1",
     "-p", "4", "--seed", "1234", "-q"], cwd=cwd)
iso_pme = iso_titles + ["posterior_mean_count",
                        "posterior_standard_deviation_of_count", "pme_TPM",
                        "pme_FPKM", "IsoPct_from_pme_TPM"]
gene_pme = gene_titles + ["posterior_mean_count",
                          "posterior_standard_deviation_of_count", "pme_TPM",
                          "pme_FPKM"]
collect(f"{imd}.iso_res", f"{cwd}/golden_pme.isoforms.results", iso_pme)
collect(f"{imd}.gene_res", f"{cwd}/golden_pme.genes.results", gene_pme)

for keep in ("golden.stat/golden.model", "golden.stat/golden.theta",
             "golden.stat/golden.cnt"):
    shutil.copy(f"{cwd}/{keep}", f"{cwd}/golden.{keep.split('.')[-1]}")

# ---------------------------------------------------------------- #
# paired-end dataset (read_type 3) + goldens, with --estimate-rspd   #
# ---------------------------------------------------------------- #
PE_READS = 4000
MATE_LEN = 40

pe_lines = []
for r in range(PE_READS):
    ti = rng.choice(len(tids), p=expr)
    seq = tx[tids[ti]]
    tl = len(seq)
    ins = int(np.clip(rng.normal(180, 25), 2 * MATE_LEN, min(tl, 400)))
    if tl < ins:
        ins = tl
    pos = int(rng.integers(0, tl - ins + 1))
    frag = seq[pos : pos + ins]
    direction = int(rng.integers(0, 2))
    if direction == 0:
        m1, m2 = frag[:MATE_LEN], revcomp(frag[-MATE_LEN:])
    else:
        m1, m2 = revcomp(frag[-MATE_LEN:]), frag[:MATE_LEN]
    q1 = "".join(chr(33 + q) for q in rng.integers(25, 40, MATE_LEN))
    q2 = "".join(chr(33 + q) for q in rng.integers(25, 40, MATE_LEN))
    # all exact alignments of the fragment
    hits = []
    for t2 in tids:
        start = 0
        while True:
            p2 = tx[t2].find(frag, start)
            if p2 < 0:
                break
            hits.append((t2, p2))
            start = p2 + 1
    first = True
    for tname, p2 in hits:
        sec = 0 if first else 256
        if direction == 0:
            # read1 fwd at p2, read2 rev at p2+ins-MATE_LEN
            f1 = 0x1 | 0x2 | 0x40 | 0x20 | sec
            f2 = 0x1 | 0x2 | 0x80 | 0x10 | sec
            pe_lines.append(
                f"P{r}\t{f1}\t{tname}\t{p2 + 1}\t255\t{MATE_LEN}M\t=\t"
                f"{p2 + ins - MATE_LEN + 1}\t{ins}\t{m1}\t{q1}"
            )
            pe_lines.append(
                f"P{r}\t{f2}\t{tname}\t{p2 + ins - MATE_LEN + 1}\t255\t"
                f"{MATE_LEN}M\t=\t{p2 + 1}\t{-ins}\t"
                f"{revcomp(m2)}\t{q2[::-1]}"
            )
        else:
            # read1 rev at p2+ins-MATE_LEN, read2 fwd at p2
            f1 = 0x1 | 0x2 | 0x40 | 0x10 | sec
            f2 = 0x1 | 0x2 | 0x80 | 0x20 | sec
            pe_lines.append(
                f"P{r}\t{f1}\t{tname}\t{p2 + ins - MATE_LEN + 1}\t255\t"
                f"{MATE_LEN}M\t=\t{p2 + 1}\t{-ins}\t"
                f"{revcomp(m1)}\t{q1[::-1]}"
            )
            pe_lines.append(
                f"P{r}\t{f2}\t{tname}\t{p2 + 1}\t255\t{MATE_LEN}M\t=\t"
                f"{p2 + ins - MATE_LEN + 1}\t{ins}\t{m2}\t{q2}"
            )
        first = False
for r in range(60):
    m1 = rand_seq(MATE_LEN)
    m2 = rand_seq(MATE_LEN)
    q1 = "".join(chr(33 + q) for q in rng.integers(25, 40, MATE_LEN))
    q2 = "".join(chr(33 + q) for q in rng.integers(25, 40, MATE_LEN))
    pe_lines.append(f"PU{r}\t{0x1 | 0x4 | 0x8 | 0x40}\t*\t0\t0\t*\t*\t0\t0\t{m1}\t{q1}")
    pe_lines.append(f"PU{r}\t{0x1 | 0x4 | 0x8 | 0x80}\t*\t0\t0\t*\t*\t0\t0\t{m2}\t{q2}")

with gzip.open(f"{OUT}/aln_pe.sam.gz", "wt") as f:
    f.write("\n".join(header + pe_lines) + "\n")
with open(f"{OUT}/aln_pe.sam", "w") as f:
    f.write("\n".join(header + pe_lines) + "\n")

os.makedirs(f"{OUT}/gpe.temp", exist_ok=True)
os.makedirs(f"{OUT}/gpe.stat", exist_ok=True)
imd2 = f"{cwd}/gpe.temp/gpe"
stat2 = f"{cwd}/gpe.stat/gpe"
run([f"{RSEM}/rsem-parse-alignments", f"{cwd}/ref", imd2, stat2,
     f"{cwd}/aln_pe.sam", "3", "-q"], cwd=cwd)
run([f"{RSEM}/rsem-build-read-index", "32", "1", "0",
     f"{imd2}_alignable_1.fq", f"{imd2}_alignable_2.fq"], cwd=cwd)
with open(f"{imd2}.mparams", "w") as f:
    f.write("1 1000\n0.5\n1\n20\n1 1000\n-1 0\n25\n")  # estRSPD on
run([f"{RSEM}/rsem-run-em", f"{cwd}/ref", "3", f"{cwd}/gpe", imd2, stat2,
     "-p", "4", "-q"], cwd=cwd)
collect(f"{imd2}.iso_res", f"{cwd}/golden_pe.isoforms.results", iso_titles)
collect(f"{imd2}.gene_res", f"{cwd}/golden_pe.genes.results", gene_titles)
shutil.copy(f"{stat2}.model", f"{cwd}/golden_pe.model")
shutil.copy(f"{stat2}.cnt", f"{cwd}/golden_pe.cnt")

# clean big intermediates; keep inputs + goldens + reference artifacts
os.remove(f"{OUT}/aln.sam")
os.remove(f"{OUT}/aln_pe.sam")
shutil.rmtree(f"{OUT}/golden.temp", ignore_errors=True)
shutil.rmtree(f"{OUT}/golden.stat", ignore_errors=True)
shutil.rmtree(f"{OUT}/gpe.temp", ignore_errors=True)
shutil.rmtree(f"{OUT}/gpe.stat", ignore_errors=True)
for f_ in os.listdir(OUT):
    if f_.endswith((".idx.fa", ".n2g.idx.fa")):
        os.remove(f"{OUT}/{f_}")
print("goldens written to", OUT)
