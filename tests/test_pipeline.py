"""Full-pipeline driver tests: prepare-reference + calculate-expression CLIs
covering point estimates, --calc-pme and --calc-ci column layouts."""

import os

import numpy as np
import pytest

from rsem_tpu.pipeline.calculate_expression import main as calc_main
from rsem_tpu.pipeline.prepare_reference import main as prep_main

from test_em_end_to_end import T1, T2, T3, _make_reads


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    (d / "tx.fa").write_text(f">t1\n{T1}\n>t2\n{T2}\n>t3\n{T3}\n")
    (d / "map.txt").write_text("gA t1\ngA t2\ngB t3\n")
    header = ["@HD\tVN:1.0"]
    for name, seq in [("t1", T1), ("t2", T2), ("t3", T3)]:
        header.append(f"@SQ\tSN:{name}\tLN:{len(seq)}")
    lines = header + _make_reads({"t1": 40, "t2": 80, "t3": 40})
    (d / "aln.sam").write_text("\n".join(lines) + "\n")
    return d


def test_prepare_reference_cli(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    rc = prep_main([
        "--transcript-to-gene-map", "map.txt", "tx.fa", "myref", "-q",
    ])
    assert rc == 0
    for ext in (".ti", ".grp", ".seq", ".transcripts.fa", ".idx.fa"):
        assert os.path.exists("myref" + ext), ext


def test_calculate_expression_point(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    if not os.path.exists("myref.ti"):
        prep_main(["--transcript-to-gene-map", "map.txt", "tx.fa", "myref", "-q"])
    rc = calc_main([
        "--alignments", "aln.sam", "myref", "sampleA", "-q",
    ])
    assert rc == 0
    iso = open("sampleA.isoforms.results").read().splitlines()
    assert iso[0].split("\t") == [
        "transcript_id", "gene_id", "length", "effective_length",
        "expected_count", "TPM", "FPKM", "IsoPct",
    ]
    rows = [l.split("\t") for l in iso[1:]]
    assert [r[0] for r in rows] == ["t1", "t2", "t3"]
    counts = np.array([float(r[4]) for r in rows])
    assert counts.sum() == pytest.approx(160, abs=1.0)
    tpms = np.array([float(r[5]) for r in rows])
    assert tpms.sum() == pytest.approx(1e6, rel=1e-4)

    gene = open("sampleA.genes.results").read().splitlines()
    assert gene[0].split("\t")[0] == "gene_id"
    assert len(gene) == 3  # 2 genes
    grow = gene[1].split("\t")
    assert grow[0] == "gA" and grow[1] == "t1,t2"

    # stat artifacts for interop
    assert os.path.exists("sampleA.stat/sampleA.cnt")
    assert os.path.exists("sampleA.stat/sampleA.model")
    assert os.path.exists("sampleA.stat/sampleA.theta")


def test_calculate_expression_pme_ci(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    if not os.path.exists("myref.ti"):
        prep_main(["--transcript-to-gene-map", "map.txt", "tx.fa", "myref", "-q"])
    rc = calc_main([
        "--alignments", "aln.sam", "myref", "sampleB", "-q",
        "--calc-pme", "--calc-ci", "--seed", "77",
        "--gibbs-burnin", "20", "--gibbs-number-of-samples", "80",
        "--ci-number-of-samples-per-count-vector", "10",
        "--estimate-rspd",
    ])
    assert rc == 0
    iso = open("sampleB.isoforms.results").read().splitlines()
    hdr = iso[0].split("\t")
    assert hdr == [
        "transcript_id", "gene_id", "length", "effective_length",
        "expected_count", "TPM", "FPKM", "IsoPct",
        "posterior_mean_count", "posterior_standard_deviation_of_count",
        "pme_TPM", "pme_FPKM", "IsoPct_from_pme_TPM",
        "TPM_ci_lower_bound", "TPM_ci_upper_bound",
        "TPM_coefficient_of_quartile_variation",
        "FPKM_ci_lower_bound", "FPKM_ci_upper_bound",
        "FPKM_coefficient_of_quartile_variation",
    ]
    rows = [l.split("\t") for l in iso[1:]]
    for r in rows:
        tpm, lb, ub = float(r[5]), float(r[13]), float(r[14])
        assert lb <= ub
        # point estimate within (or close to) the credibility interval
        assert lb * 0.5 - 50 <= tpm <= ub * 1.5 + 50

    gene = open("sampleB.genes.results").read().splitlines()
    ghdr = gene[0].split("\t")
    assert ghdr[7] == "posterior_mean_count"
    assert ghdr[-1] == "FPKM_coefficient_of_quartile_variation"
    # pme counts sum to total reads
    pme = sum(float(l.split("\t")[7]) for l in gene[1:])
    assert pme == pytest.approx(160, abs=2.0)


def test_calculate_expression_allele_mode(tmp_path, monkeypatch):
    """Allele-specific reference -> .alleles.results + transcript-level
    isoforms.results + gene results, incl. PME/CI columns."""
    monkeypatch.chdir(tmp_path)
    # two alleles of tX differing by nothing (share T1), one allele of tY
    (tmp_path / "alleles.fa").write_text(
        f">tX_a1\n{T1}\n>tX_a2\n{T1[:-3]}\n>tY_a1\n{T3}\n"
    )
    (tmp_path / "amap.txt").write_text(
        "gA tX tX_a1\ngA tX tX_a2\ngB tY tY_a1\n"
    )
    rc = prep_main([
        "--allele-to-gene-map", "amap.txt", "alleles.fa", "aref", "-q",
    ])
    assert rc == 0
    assert os.path.exists("aref.gt") and os.path.exists("aref.ta")

    header = ["@HD\tVN:1.0"]
    for name, seq in [("tX_a1", T1), ("tX_a2", T1[:-3]), ("tY_a1", T3)]:
        header.append(f"@SQ\tSN:{name}\tLN:{len(seq)}")
    rng = np.random.RandomState(42)
    fixed = list(header)
    rl = 30
    rid = 0
    for _ in range(60):  # multi-mapping reads shared by both tX alleles
        pos = int(rng.randint(0, len(T1) - 3 - rl + 1))
        frag = T1[pos:pos + rl]
        q = "I" * rl
        fixed.append(f"r{rid}\t0\ttX_a1\t{pos + 1}\t255\t{rl}M\t*\t0\t0\t{frag}\t{q}")
        fixed.append(f"r{rid}\t256\ttX_a2\t{pos + 1}\t255\t{rl}M\t*\t0\t0\t{frag}\t{q}")
        rid += 1
    for _ in range(40):
        pos = int(rng.randint(0, len(T3) - rl + 1))
        frag = T3[pos:pos + rl]
        q = "I" * rl
        fixed.append(f"r{rid}\t0\ttY_a1\t{pos + 1}\t255\t{rl}M\t*\t0\t0\t{frag}\t{q}")
        rid += 1
    (tmp_path / "aln.sam").write_text("\n".join(fixed) + "\n")

    rc = calc_main([
        "--alignments", "aln.sam", "aref", "asample", "-q",
        "--calc-pme", "--calc-ci", "--seed", "5",
        "--gibbs-burnin", "10", "--gibbs-number-of-samples", "48",
        "--ci-number-of-samples-per-count-vector", "5",
    ])
    assert rc == 0

    al = open("asample.alleles.results").read().splitlines()
    hdr = al[0].split("\t")
    assert hdr[:10] == [
        "allele_id", "transcript_id", "gene_id", "length",
        "effective_length", "expected_count", "TPM", "FPKM",
        "AlleleIsoPct", "AlleleGenePct",
    ]
    assert "pme_TPM" in hdr and "TPM_ci_lower_bound" in hdr
    rows = [l.split("\t") for l in al[1:]]
    assert [r[0] for r in rows] == ["tX_a1", "tX_a2", "tY_a1"]
    assert [r[1] for r in rows] == ["tX", "tX", "tY"]

    iso = open("asample.isoforms.results").read().splitlines()
    irows = [l.split("\t") for l in iso[1:]]
    assert [r[0] for r in irows] == ["tX", "tY"]
    # transcript counts = sum of allele counts
    a_counts = np.array([float(r[5]) for r in rows])
    i_counts = np.array([float(r[4]) for r in irows])
    assert i_counts[0] == pytest.approx(a_counts[0] + a_counts[1], abs=0.02)
    assert i_counts.sum() == pytest.approx(100, abs=1.0)

    gene = open("asample.genes.results").read().splitlines()
    grows = [l.split("\t") for l in gene[1:]]
    assert [r[0] for r in grows] == ["gA", "gB"]
    assert grows[0][1] == "tX"  # dedup allele transcript ids
