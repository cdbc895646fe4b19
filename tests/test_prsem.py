"""pRSEM subsystem: mappability, training-set selection, TSS-peak features,
Dirichlet-multinomial prior fit, and the full --run-pRSEM pipeline."""

import os

import numpy as np
import pytest

from rsem_tpu.pipeline.calculate_expression import main as calc_main
from rsem_tpu.pipeline.prepare_reference import main as prep_main
from rsem_tpu.prsem import (
    Mappability,
    build_coords,
    dm_log_likelihood,
    fit_partitioned_dm,
    informative_pvalue,
    read_peaks,
    select_training_set,
    tss_peak_flags,
)
from rsem_tpu.prsem.coords import TrCoord
from rsem_tpu.refprep.transcripts import Transcript, Transcripts


class TestMappability:
    def test_uniform_when_no_file(self):
        m = Mappability(None)
        assert m.mean("chr1", 100, 200) == 1.0

    def test_bedgraph_mean(self, tmp_path):
        p = tmp_path / "mpp.bedGraph"
        # chr1: [0,100) -> 1.0 ; [100,200) -> 0.5
        p.write_text("chr1\t0\t100\t1.0\nchr1\t100\t200\t0.5\n")
        m = Mappability(str(p))
        assert m.mean("chr1", 1, 100) == pytest.approx(1.0)
        assert m.mean("chr1", 101, 200) == pytest.approx(0.5)
        assert m.mean("chr1", 51, 150) == pytest.approx(0.75)
        # uncovered bases count as zero
        assert m.mean("chr1", 151, 250) == pytest.approx(0.25)
        assert m.mean("chr2", 1, 100) == 0.0


def _tr(trid, gid, chrom, strand, exons):
    return TrCoord(gene_id=gid, trid=trid, chrom=chrom, strand=strand,
                   start=exons[0][0], end=exons[-1][1], exons=exons)


class TestTrainingSet:
    def test_filters(self):
        coords = [
            # good candidate: single-isoform, long, isolated
            _tr("tA", "gA", "chr1", "+", [(1000, 2500)]),
            # two-isoform gene: excluded
            _tr("tB1", "gB", "chr1", "+", [(10000, 12000)]),
            _tr("tB2", "gB", "chr1", "+", [(10000, 12500)]),
            # too short
            _tr("tC", "gC", "chr1", "+", [(20000, 20500)]),
            # nested within tE: excluded
            _tr("tD", "gD", "chr1", "+", [(30100, 31500)]),
            _tr("tE", "gE", "chr1", "-", [(30000, 36000)]),
            # TSS conflict pair (within 500): both excluded
            _tr("tF", "gF", "chr1", "+", [(50000, 52000)]),
            _tr("tG", "gG", "chr1", "+", [(50300, 52500)]),
        ]
        idx = select_training_set(coords, Mappability(None))
        picked = {coords[i].trid for i in idx}
        # tE survives: single isoform, long, spans tD but is not nested itself
        # ... but tD's TSS (30100) is within 500 of nothing else, tE's TSS
        # (36000) is isolated; tD is nested in tE so only tE remains there.
        assert "tA" in picked
        assert "tB1" not in picked and "tB2" not in picked
        assert "tC" not in picked
        assert "tD" not in picked
        assert "tE" in picked
        assert "tF" not in picked and "tG" not in picked

    def test_exon_coverage_filter(self):
        coords = [
            # tH's single exon is inside tI's first exon: exon-coverage
            # excluded (TSSs are >500 apart so that filter does not fire)
            _tr("tH", "gH", "chr2", "+", [(1500, 2600)]),
            _tr("tI", "gI", "chr2", "+", [(900, 2700), (5000, 6200)]),
        ]
        idx = select_training_set(coords, Mappability(None))
        picked = {coords[i].trid for i in idx}
        assert "tH" not in picked  # nested (also exon-covered)
        assert "tI" in picked

    def test_mappability_filter(self, tmp_path):
        p = tmp_path / "m.bedGraph"
        # only tA's neighborhood is mappable
        p.write_text("chr1\t0\t5000\t1.0\n")
        coords = [
            _tr("tA", "gA", "chr1", "+", [(1000, 2500)]),
            _tr("tZ", "gZ", "chr1", "+", [(20000, 22000)]),
        ]
        idx = select_training_set(coords, Mappability(str(p)))
        assert {coords[i].trid for i in idx} == {"tA"}


class TestPeaks:
    def test_read_peaks_bed_conversion_and_merge(self, tmp_path):
        p = tmp_path / "pk.bed"
        p.write_text("chr1\t99\t200\nchr1\t150\t300\nchr2\t0\t10\n")
        pks = read_peaks(str(p))
        assert pks["chr1"].tolist() == [[100, 300]]
        assert pks["chr2"].tolist() == [[1, 10]]

    def test_tss_peak_flags(self, tmp_path):
        p = tmp_path / "pk.bed"
        p.write_text("chr1\t999\t1100\n")  # 1-based [1000,1100]
        coords = [
            _tr("tA", "gA", "chr1", "+", [(1400, 3000)]),  # tss 1400, w=500
            _tr("tB", "gB", "chr1", "+", [(1700, 3000)]),  # window starts 1200
            _tr("tC", "gC", "chr1", "-", [(1, 900)]),  # tss 900, window hits
            _tr("tD", "gD", "chr2", "+", [(1400, 3000)]),  # wrong chrom
        ]
        flags = tss_peak_flags(coords, read_peaks(str(p)), flanking_width=500)
        assert flags.tolist() == [1, 0, 1, 0]


class TestDMFit:
    def test_alpha_ordering_and_gradient_optimum(self):
        rng = np.random.RandomState(3)
        counts = np.concatenate([
            rng.uniform(1, 6, 12), rng.uniform(80, 250, 12)
        ])
        part = np.concatenate([np.zeros(12, int), np.ones(12, int)])
        alpha, logl = fit_partitioned_dm(counts, part, 2)
        assert alpha[1] > alpha[0] > 0
        # the fit is a local max: nudging alpha reduces likelihood
        for d in ([0.05, 0], [-0.05, 0], [0, 0.5], [0, -0.5]):
            assert dm_log_likelihood(alpha + d, counts, part) <= logl + 1e-6

    def test_informative_pvalue(self):
        hi = np.arange(100, 110, dtype=float)
        lo = np.arange(1, 11, dtype=float)
        assert informative_pvalue(hi, lo) < 0.001
        assert informative_pvalue(lo, hi) > 0.5
        assert informative_pvalue(np.array([]), lo) == 1.0


def _make_genome_and_gtf(d, n_peak=8, n_nopk=8, tlen=1200, gap=3000):
    rng = np.random.RandomState(7)
    bases = np.array(list("ACGT"))
    genes = []
    pos = 1000
    chrom_parts = []
    cur = 0
    seq = []
    for i in range(n_peak + n_nopk):
        start = pos
        end = pos + tlen - 1
        genes.append((f"g{i}", f"t{i}", start, end, i < n_peak))
        pos = end + gap
    glen = pos + 1000
    genome = "".join(rng.choice(bases, size=glen))
    (d / "genome.fa").write_text(f">chr1\n{genome}\n")
    gtf = []
    for gid, tid, s, e, _ in genes:
        attrs = f'gene_id "{gid}"; transcript_id "{tid}";'
        gtf.append(f"chr1\tsrc\texon\t{s}\t{e}\t.\t+\t.\t{attrs}")
    (d / "anno.gtf").write_text("\n".join(gtf) + "\n")
    # peaks over the TSS of the first n_peak genes
    peaks = []
    for gid, tid, s, e, has in genes:
        if has:
            peaks.append(f"chr1\t{s - 50}\t{s + 50}")
    (d / "peaks.bed").write_text("\n".join(peaks) + "\n")
    return genome, genes


def _reads_sam(genome, genes, d, high=40, low=3, rl=50):
    rng = np.random.RandomState(11)
    header = ["@HD\tVN:1.0"]
    for gid, tid, s, e, _ in genes:
        header.append(f"@SQ\tSN:{tid}\tLN:{e - s + 1}")
    lines = list(header)
    rid = 0
    for gid, tid, s, e, has in genes:
        tseq = genome[s - 1 : e]
        n = high if has else low
        for _ in range(n):
            p = int(rng.randint(0, len(tseq) - rl + 1))
            frag = tseq[p : p + rl]
            q = "I" * rl
            lines.append(
                f"r{rid}\t0\t{tid}\t{p + 1}\t255\t{rl}M\t*\t0\t0\t{frag}\t{q}"
            )
            rid += 1
    (d / "aln.sam").write_text("\n".join(lines) + "\n")
    return rid


@pytest.fixture(scope="module")
def prsem_sample(tmp_path_factory):
    d = tmp_path_factory.mktemp("prsem")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        genome, genes = _make_genome_and_gtf(d)
        n_reads = _reads_sam(genome, genes, d)
        assert prep_main(["--gtf", "anno.gtf", "genome.fa", "gref", "-q"]) == 0
        rc = calc_main([
            "--alignments", "aln.sam", "gref", "psm", "-q",
            "--calc-pme", "--seed", "13",
            "--gibbs-burnin", "20", "--gibbs-number-of-samples", "80",
            "--run-pRSEM", "--chipseq-peak-file", "peaks.bed",
            "--keep-intermediate-files",
        ])
        assert rc == 0
    finally:
        os.chdir(cwd)
    return d, genes


def test_run_prsem_end_to_end(prsem_sample):
    d, genes = prsem_sample
    stat = d / "psm.stat" / "psm"
    imd = d / "psm.temp" / "psm"

    # artifacts
    assert (d / "psm.stat" / "psm_uniform_prior_1.isoforms.results").exists()
    assert (d / "psm.stat" / "psm_uniform_prior_1.genes.results").exists()
    for suffix in (".all_tr_features", ".all_tr_prior", ".training_tr_crd"):
        assert (d / "psm.temp" / ("psm_prsem" + suffix)).exists(), suffix
    pval_ll = (d / "psm.stat" / "psm_prsem.pval_LL").read_text().splitlines()
    assert pval_ll[0] == "pvalue\tloglikelihood"
    pval = float(pval_ll[1].split("\t")[0])
    assert pval < 0.01  # clearly informative by construction

    # prior file: one line per isoform, peak genes get the larger alpha
    priors = {}
    with open(d / "psm.temp" / "psm_prsem.all_tr_prior") as f:
        for line in f:
            val, _, trid = line.split()
            priors[trid] = float(val)
    assert len(priors) == len(genes)
    pk_prior = {p for t, p in priors.items()
                if any(g[1] == t and g[4] for g in genes)}
    nopk_prior = {p for t, p in priors.items()
                  if any(g[1] == t and not g[4] for g in genes)}
    assert len(pk_prior) == 1 and len(nopk_prior) == 1
    assert pk_prior.pop() > nopk_prior.pop()

    # final results carry prior-informed PME columns (EM + PME, no CI)
    iso = (d / "psm.isoforms.results").read_text().splitlines()
    hdr = iso[0].split("\t")
    assert "posterior_mean_count" in hdr
    assert "TPM_ci_lower_bound" not in hdr
    rows = {l.split("\t")[0]: l.split("\t") for l in iso[1:]}
    pme_col = hdr.index("posterior_mean_count")
    total_pme = sum(float(r[pme_col]) for r in rows.values())
    n_reads = sum(40 if g[4] else 3 for g in genes)
    assert total_pme == pytest.approx(n_reads, rel=0.02)

    # features table labels training + peaks
    feat = (d / "psm.temp" / "psm_prsem.all_tr_features").read_text()
    flines = feat.splitlines()
    fh = flines[0].split("\t")
    ipk, itr = fh.index("tss_pk"), fh.index("is_training")
    n_pk = sum(int(l.split("\t")[ipk]) for l in flines[1:])
    n_tr = sum(int(l.split("\t")[itr]) for l in flines[1:])
    assert n_pk == sum(1 for g in genes if g[4])
    assert n_tr == len(genes)  # isolated single-isoform genes: all train


def test_prsem_testing_procedure_cli(prsem_sample, monkeypatch):
    d, genes = prsem_sample
    monkeypatch.chdir(d)
    from rsem_tpu.__main__ import main as cli_main

    msgs = []
    rc = cli_main([
        "run-prsem-testing-procedure", "gref", "psm",
        "--chipseq-peak-file", "peaks.bed", "-q",
    ])
    assert rc == 0


def test_prsem_requires_pme(prsem_sample, monkeypatch):
    d, genes = prsem_sample
    monkeypatch.chdir(d)
    with pytest.raises(ValueError, match="calc-pme"):
        calc_main([
            "--alignments", "aln.sam", "gref", "px", "-q",
            "--run-pRSEM", "--chipseq-peak-file", "peaks.bed",
        ])


def _make_chipseq_tagalign(d, genes, glen=70000, seed=21):
    """Synthetic ChIP-seq tagAlign: read stacks around peak-gene TSSs plus
    uniform background, written as two replicate files."""
    import gzip

    rng = np.random.RandomState(seed)
    rl, fl = 50, 150
    rows = []
    for gid, tid, s, e, has in genes:
        if not has:
            continue
        centers = rng.randint(s - 80, s + 80, 120)
        for c in centers:
            if rng.uniform() < 0.5:
                st, sp = "+", c - fl // 2
            else:
                st, sp = "-", c + fl // 2 - rl
            sp = max(int(sp), 0)
            rows.append(("chr1", sp, sp + rl, st))
    bg = rng.randint(0, glen - rl, 600)
    for sp in bg:
        rows.append(("chr1", int(sp), int(sp) + rl,
                     "+" if rng.uniform() < 0.5 else "-"))
    rng.shuffle(rows)
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with gzip.open(d / f"chip_rep{i + 1}.tagAlign.gz", "wt") as f:
            for ch, s0, e0, st in chunk:
                f.write(f"{ch}\t{s0}\t{e0}\tN\t1000\t{st}\n")


@pytest.mark.parametrize("model", ["pk", "lm3", "nopk_lm2pk", "pk_lgtnopk"])
def test_run_prsem_chipseq_leg_models(prsem_sample, monkeypatch, model):
    """End-to-end --run-pRSEM from raw ChIP-seq tagAlign replicates: native
    peak calling + reproducibility + the signal-based partition models."""
    d, genes = prsem_sample
    monkeypatch.chdir(d)
    _make_chipseq_tagalign(d, genes)
    sample = f"pcl_{model}"
    rc = calc_main([
        "--alignments", "aln.sam", "gref", sample, "-q",
        "--calc-pme", "--seed", "13",
        "--gibbs-burnin", "20", "--gibbs-number-of-samples", "80",
        "--run-pRSEM", "--partition-model", model,
        "--chipseq-target-read-files",
        "chip_rep1.tagAlign.gz:chip_rep2.tagAlign.gz",
        "--keep-intermediate-files",
    ])
    assert rc == 0
    # native peak caller artifacts + prior file exist
    temp = d / f"{sample}.temp"
    assert (temp / "idr_target_vs_control.regionPeak.gz").exists()
    assert (temp / "target.tagAlign.gz").exists()
    priors = {}
    with open(temp / f"{sample}_prsem.all_tr_prior") as f:
        for line in f:
            val, _, trid = line.split()
            priors[trid] = float(val)
    assert len(priors) == len(genes)
    # peak genes get (weakly) larger priors on this separated fixture
    pk_mean = np.mean([priors[t] for g, t, s, e, h in genes if h])
    nopk_mean = np.mean([priors[t] for g, t, s, e, h in genes if not h])
    assert pk_mean > nopk_mean


def test_run_prsem_cmb_lgt(prsem_sample, monkeypatch):
    d, genes = prsem_sample
    monkeypatch.chdir(d)
    _make_chipseq_tagalign(d, genes)
    rc = calc_main([
        "--alignments", "aln.sam", "gref", "pcmb", "-q",
        "--calc-pme", "--seed", "13",
        "--gibbs-burnin", "20", "--gibbs-number-of-samples", "80",
        "--run-pRSEM", "--partition-model", "cmb_lgt",
        "--chipseq-bed-files-multi-targets",
        "chip_rep1.tagAlign.gz:chip_rep2.tagAlign.gz",
        "--cap-stacked-chipseq-reads",
        "--keep-intermediate-files",
    ])
    assert rc == 0
    feat = (d / "pcmb.temp" / "pcmb_prsem.all_tr_features").read_text()
    assert "partition" in feat.splitlines()[0]
