"""Generate the round-2 golden parity fixtures from the *reference* RSEM
binaries (VERDICT.md item 5): model types 0 and 2, credibility-interval
columns, and a reference-simulator output for cross-checking.

Reuses the transcriptome written by tools/make_goldens.py (tests/goldens/
tx.fa + map.txt + ref.*) so all fixtures share one reference.

Usage: RSEM_BIN=/tmp/rsem-build python tools/make_goldens_extra.py [outdir]

Produces under tests/goldens/:
  aln_se0.sam.gz                       single-end no-qual input (type 0)
  golden_se0.{isoforms,genes}.results  + golden_se0.{model,cnt}
  aln_pe2.sam.gz                       paired-end no-qual input (type 2)
  golden_pe2.{isoforms,genes}.results  + golden_pe2.{model,cnt}
  golden_ci.isoforms.results           CI columns (calcCI.cpp:218-284)
  golden.countvectors.gz               the Gibbs count vectors CI consumed
  sim.fq.gz + golden_sim.isoforms.results   rsem-simulate-reads output
"""

import glob
import gzip
import os
import shutil
import subprocess
import sys

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "tests/goldens"
RSEM = os.environ.get("RSEM_BIN", "/tmp/rsem-build")
cwd = os.path.abspath(OUT)

rng = np.random.default_rng(20260820)
BASES = np.array(list("ACGT"))
COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(s):
    return s.translate(COMP)[::-1]


def rand_seq(n):
    return "".join(rng.choice(BASES, n))


def run(cmd, **kw):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True, **kw)


# ---- load the shared transcriptome ----
tx = {}
tid = None
for line in open(f"{OUT}/tx.fa"):
    line = line.strip()
    if line.startswith(">"):
        tid = line[1:].split()[0]
        tx[tid] = []
    else:
        tx[tid].append(line)
tx = {t: "".join(p) for t, p in tx.items()}
tids = list(tx.keys())
lens = np.array([len(tx[t]) for t in tids])
expr = rng.dirichlet(np.full(len(tids), 0.4)) * lens / lens.mean()
expr /= expr.sum()

header = ["@HD\tVN:1.0"] + [f"@SQ\tSN:{t}\tLN:{len(tx[t])}" for t in tids]


def find_hits(frag):
    hits = []
    for t2 in tids:
        start = 0
        while True:
            p2 = tx[t2].find(frag, start)
            if p2 < 0:
                break
            hits.append((t2, p2))
            start = p2 + 1
    return hits


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

# ================================================================== #
# 1. model type 0: single-end, no quals, WITH --fragment-length-mean  #
#    210 --fragment-length-sd 60 (exercises the mld marginalization,  #
#    SingleModel.h:122-131)                                           #
# ================================================================== #
READ_LEN = 50
N_READS = 5000
se0_lines = []
for r in range(N_READS):
    ti = rng.choice(len(tids), p=expr)
    seq = tx[tids[ti]]
    pos = int(rng.integers(0, len(seq) - READ_LEN + 1))
    frag = seq[pos : pos + READ_LEN]
    direction = int(rng.integers(0, 2))
    read = frag if direction == 0 else revcomp(frag)
    read_arr = np.array(list(read))
    err = rng.random(READ_LEN) < 0.003
    read_arr[err] = rng.choice(BASES, err.sum())
    read = "".join(read_arr)
    first = True
    for tname, p2 in find_hits(frag):
        flag = (16 if direction else 0) | (0 if first else 256)
        s_out = revcomp(read) if direction else read
        se0_lines.append(
            f"S{r}\t{flag}\t{tname}\t{p2 + 1}\t255\t{READ_LEN}M\t*\t0\t0\t"
            f"{s_out}\t*"
        )
        first = False
for r in range(100):
    se0_lines.append(f"SU{r}\t4\t*\t0\t0\t*\t*\t0\t0\t{rand_seq(READ_LEN)}\t*")

with open(f"{OUT}/aln_se0.sam", "w") as f:
    f.write("\n".join(header + se0_lines) + "\n")
with gzip.open(f"{OUT}/aln_se0.sam.gz", "wt") as f:
    f.write("\n".join(header + se0_lines) + "\n")

os.makedirs(f"{OUT}/g0.temp", exist_ok=True)
os.makedirs(f"{OUT}/g0.stat", exist_ok=True)
imd0 = f"{cwd}/g0.temp/g0"
stat0 = f"{cwd}/g0.stat/g0"
run([f"{RSEM}/rsem-parse-alignments", f"{cwd}/ref", imd0, stat0,
     f"{cwd}/aln_se0.sam", "0", "-q"], cwd=cwd)
run([f"{RSEM}/rsem-build-read-index", "32", "0", "0", f"{imd0}_alignable.fa"],
    cwd=cwd)
with open(f"{imd0}.mparams", "w") as f:
    # minL maxL / probF / estRSPD / B / mate_minL mate_maxL / mean sd / seedLen
    f.write("1 1000\n0.5\n0\n20\n1 1000\n210 60\n25\n")
run([f"{RSEM}/rsem-run-em", f"{cwd}/ref", "0", f"{cwd}/g0", imd0, stat0,
     "-p", "2", "-q"], cwd=cwd)
collect(f"{imd0}.iso_res", f"{cwd}/golden_se0.isoforms.results", iso_titles)
collect(f"{imd0}.gene_res", f"{cwd}/golden_se0.genes.results", gene_titles)
shutil.copy(f"{stat0}.model", f"{cwd}/golden_se0.model")
shutil.copy(f"{stat0}.cnt", f"{cwd}/golden_se0.cnt")

# ================================================================== #
# 2. model type 2: paired-end, no quals (PairedEndModel.h:90-135)     #
# ================================================================== #
PE_READS = 4000
MATE_LEN = 40
pe2_lines = []
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
    first = True
    for tname, p2 in find_hits(frag):
        sec = 0 if first else 256
        if direction == 0:
            f1 = 0x1 | 0x2 | 0x40 | 0x20 | sec
            f2 = 0x1 | 0x2 | 0x80 | 0x10 | sec
            pe2_lines.append(
                f"Q{r}\t{f1}\t{tname}\t{p2 + 1}\t255\t{MATE_LEN}M\t=\t"
                f"{p2 + ins - MATE_LEN + 1}\t{ins}\t{m1}\t*")
            pe2_lines.append(
                f"Q{r}\t{f2}\t{tname}\t{p2 + ins - MATE_LEN + 1}\t255\t"
                f"{MATE_LEN}M\t=\t{p2 + 1}\t{-ins}\t{revcomp(m2)}\t*")
        else:
            f1 = 0x1 | 0x2 | 0x40 | 0x10 | sec
            f2 = 0x1 | 0x2 | 0x80 | 0x20 | sec
            pe2_lines.append(
                f"Q{r}\t{f1}\t{tname}\t{p2 + ins - MATE_LEN + 1}\t255\t"
                f"{MATE_LEN}M\t=\t{p2 + 1}\t{-ins}\t{revcomp(m1)}\t*")
            pe2_lines.append(
                f"Q{r}\t{f2}\t{tname}\t{p2 + 1}\t255\t{MATE_LEN}M\t=\t"
                f"{p2 + ins - MATE_LEN + 1}\t{ins}\t{m2}\t*")
        first = False
for r in range(50):
    pe2_lines.append(
        f"QU{r}\t{0x1 | 0x4 | 0x8 | 0x40}\t*\t0\t0\t*\t*\t0\t0\t{rand_seq(MATE_LEN)}\t*")
    pe2_lines.append(
        f"QU{r}\t{0x1 | 0x4 | 0x8 | 0x80}\t*\t0\t0\t*\t*\t0\t0\t{rand_seq(MATE_LEN)}\t*")

with open(f"{OUT}/aln_pe2.sam", "w") as f:
    f.write("\n".join(header + pe2_lines) + "\n")
with gzip.open(f"{OUT}/aln_pe2.sam.gz", "wt") as f:
    f.write("\n".join(header + pe2_lines) + "\n")

os.makedirs(f"{OUT}/g2.temp", exist_ok=True)
os.makedirs(f"{OUT}/g2.stat", exist_ok=True)
imd2 = f"{cwd}/g2.temp/g2"
stat2 = f"{cwd}/g2.stat/g2"
run([f"{RSEM}/rsem-parse-alignments", f"{cwd}/ref", imd2, stat2,
     f"{cwd}/aln_pe2.sam", "2", "-q"], cwd=cwd)
run([f"{RSEM}/rsem-build-read-index", "32", "0", "0",
     f"{imd2}_alignable_1.fa", f"{imd2}_alignable_2.fa"], cwd=cwd)
with open(f"{imd2}.mparams", "w") as f:
    f.write("1 1000\n0.5\n0\n20\n1 1000\n-1 0\n25\n")
run([f"{RSEM}/rsem-run-em", f"{cwd}/ref", "2", f"{cwd}/g2", imd2, stat2,
     "-p", "2", "-q"], cwd=cwd)
collect(f"{imd2}.iso_res", f"{cwd}/golden_pe2.isoforms.results", iso_titles)
collect(f"{imd2}.gene_res", f"{cwd}/golden_pe2.genes.results", gene_titles)
shutil.copy(f"{stat2}.model", f"{cwd}/golden_pe2.model")
shutil.copy(f"{stat2}.cnt", f"{cwd}/golden_pe2.cnt")

# ================================================================== #
# 3. CI columns on the type-1 dataset (calcCI.cpp:218-284)            #
# ================================================================== #
with gzip.open(f"{OUT}/aln.sam.gz", "rb") as fi, open(f"{OUT}/aln.sam", "wb") as fo:
    shutil.copyfileobj(fi, fo)
os.makedirs(f"{OUT}/gci.temp", exist_ok=True)
os.makedirs(f"{OUT}/gci.stat", exist_ok=True)
imdc = f"{cwd}/gci.temp/gci"
statc = f"{cwd}/gci.stat/gci"
run([f"{RSEM}/rsem-parse-alignments", f"{cwd}/ref", imdc, statc,
     f"{cwd}/aln.sam", "1", "-q"], cwd=cwd)
run([f"{RSEM}/rsem-build-read-index", "32", "1", "0", f"{imdc}_alignable.fq"],
    cwd=cwd)
with open(f"{imdc}.mparams", "w") as f:
    f.write("1 1000\n0.5\n0\n20\n1 1000\n-1 0\n25\n")
run([f"{RSEM}/rsem-run-em", f"{cwd}/ref", "1", f"{cwd}/gci", imdc, statc,
     "-p", "2", "-q", "--gibbs-out"], cwd=cwd)
run([f"{RSEM}/rsem-run-gibbs", f"{cwd}/ref", imdc, statc, "200", "1000", "1",
     "-p", "1", "--seed", "7777", "-q"], cwd=cwd)
run([f"{RSEM}/rsem-calculate-credibility-intervals", f"{cwd}/ref", imdc,
     statc, "0.95", "1000", "50", "1024", "-p", "1", "--seed", "8888", "-q"],
    cwd=cwd)
iso_ci = iso_titles + ["posterior_mean_count",
                       "posterior_standard_deviation_of_count", "pme_TPM",
                       "pme_FPKM", "IsoPct_from_pme_TPM",
                       "TPM_ci_lower_bound", "TPM_ci_upper_bound",
                       "TPM_coefficient_of_quartile_variation",
                       "FPKM_ci_lower_bound", "FPKM_ci_upper_bound",
                       "FPKM_coefficient_of_quartile_variation"]
gene_ci = gene_titles + ["posterior_mean_count",
                         "posterior_standard_deviation_of_count", "pme_TPM",
                         "pme_FPKM",
                         "TPM_ci_lower_bound", "TPM_ci_upper_bound",
                         "TPM_coefficient_of_quartile_variation",
                         "FPKM_ci_lower_bound", "FPKM_ci_upper_bound",
                         "FPKM_coefficient_of_quartile_variation"]
collect(f"{imdc}.iso_res", f"{cwd}/golden_ci.isoforms.results", iso_ci)
collect(f"{imdc}.gene_res", f"{cwd}/golden_ci.genes.results", gene_ci)
# keep the count vectors CI consumed, so our CI can run on identical input
cvs = sorted(glob.glob(f"{imdc}.countvectors*"))
assert cvs, "no countvectors written by rsem-run-gibbs"
with gzip.open(f"{cwd}/golden.countvectors.gz", "wt") as fo:
    for cv in cvs:
        fo.write(open(cv).read())

# ================================================================== #
# 4. reference simulator output (simulation.cpp:86-130)               #
# ================================================================== #
run([f"{RSEM}/rsem-simulate-reads", f"{cwd}/ref", f"{cwd}/golden.model",
     f"{cwd}/golden.isoforms.results", "0.05", "100000", f"{cwd}/sim",
     "--seed", "4242", "-q"], cwd=cwd)
with open(f"{cwd}/sim.fq", "rb") as fi, gzip.open(f"{cwd}/sim.fq.gz", "wb") as fo:
    shutil.copyfileobj(fi, fo)
shutil.copy(f"{cwd}/sim.sim.isoforms.results", f"{cwd}/golden_sim.isoforms.results")
shutil.copy(f"{cwd}/sim.sim.genes.results", f"{cwd}/golden_sim.genes.results")

# ---- clean intermediates ----
for f_ in ("aln.sam", "aln_se0.sam", "aln_pe2.sam", "sim.fq",
           "sim.sim.isoforms.results", "sim.sim.genes.results"):
    p = f"{OUT}/{f_}"
    if os.path.exists(p):
        os.remove(p)
for d_ in ("g0", "g2", "gci"):
    shutil.rmtree(f"{OUT}/{d_}.temp", ignore_errors=True)
    shutil.rmtree(f"{OUT}/{d_}.stat", ignore_errors=True)
print("extra goldens written to", OUT)
