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
