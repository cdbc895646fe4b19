"""Driver conveniences: --fai (header-less SAM), --time (sample.time),
--temporary-folder, gz-FASTQ decompression for bowtie, CRAM detection, and
the per-stage timing utility."""

import gzip
import os

import numpy as np
import pytest

from rsem_tpu.pipeline.calculate_expression import main as calc_main
from rsem_tpu.pipeline.prepare_reference import main as prep_main
from rsem_tpu.utils.timing import StageTimer

from test_em_end_to_end import T1, T2, T3, _make_reads


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("drvio")
    (d / "tx.fa").write_text(f">t1\n{T1}\n>t2\n{T2}\n>t3\n{T3}\n")
    (d / "map.txt").write_text("gA t1\ngA t2\ngB t3\n")
    header = ["@HD\tVN:1.0"]
    body = _make_reads({"t1": 40, "t2": 80, "t3": 40})
    for name, seq in [("t1", T1), ("t2", T2), ("t3", T3)]:
        header.append(f"@SQ\tSN:{name}\tLN:{len(seq)}")
    (d / "aln.sam").write_text("\n".join(header + body) + "\n")
    # header-less SAM + .fai (rsem-calculate-expression --fai)
    (d / "aln_nohdr.sam").write_text("\n".join(body) + "\n")
    (d / "tx.fai").write_text(
        "".join(f"{n}\t{len(s)}\t0\t0\t0\n"
                for n, s in [("t1", T1), ("t2", T2), ("t3", T3)])
    )
    cwd = os.getcwd()
    os.chdir(d)
    try:
        assert prep_main([
            "--transcript-to-gene-map", "map.txt", "tx.fa", "fref", "-q",
        ]) == 0
    finally:
        os.chdir(cwd)
    return d


def test_fai_headerless_sam(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    rc = calc_main([
        "--alignments", "aln_nohdr.sam", "fref", "s_fai", "-q",
        "--fai", "tx.fai", "--no-bam-output",
    ])
    assert rc == 0
    iso = open("s_fai.isoforms.results").read().splitlines()
    counts = np.array([float(l.split("\t")[4]) for l in iso[1:]])
    assert counts.sum() == pytest.approx(160, abs=1.0)
    # identical results to the headered input
    assert calc_main(["--alignments", "aln.sam", "fref", "s_hdr", "-q",
                      "--no-bam-output"]) == 0
    assert (open("s_fai.isoforms.results").read()
            == open("s_hdr.isoforms.results").read())


def test_time_file_and_temporary_folder(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    tmp = str(workdir / "mytemp")
    rc = calc_main([
        "--alignments", "aln.sam", "fref", "s_time", "-q",
        "--time", "--temporary-folder", tmp, "--no-bam-output",
    ])
    assert rc == 0
    t = open("s_time.time").read()
    assert "Aligning reads:" in t
    assert "Estimating expression levels:" in t
    assert "Calculating credibility intervals:" in t
    assert "# parse-alignments:" in t  # per-stage breakdown
    # user-specified temp folder is used and never deleted
    assert os.path.isdir(tmp)
    assert os.path.exists(os.path.join(tmp, "s_time.mparams"))
    assert not os.path.exists("s_time.temp")


def test_stage_timer_report_and_file(tmp_path):
    tm = StageTimer()
    with tm.stage("em"):
        pass
    tm.add("ci", 1.5)
    assert tm.get("ci") == 1.5
    out = []
    tm.report(log=out.append, n_reads=1000)
    assert any("throughput" in l for l in out)
    p = tmp_path / "s.time"
    tm.write_time_file(str(p), aligning=2.0)
    txt = p.read_text()
    assert "Aligning reads: 2 s." in txt
    assert "Calculating credibility intervals: 1.50 s." in txt


def test_cram_detection_without_samtools(tmp_path, monkeypatch):
    from rsem_tpu.io.sam import open_alignment_file

    cram = tmp_path / "x.cram"
    cram.write_bytes(b"CRAM\x03\x00junk")
    import shutil as _sh

    if _sh.which("samtools") is None:
        with pytest.raises(RuntimeError, match="samtools"):
            open_alignment_file(str(cram))
    else:
        with pytest.raises(Exception):
            open_alignment_file(str(cram))  # junk payload fails decode


def test_load_fai(tmp_path):
    from rsem_tpu.io.sam import load_fai

    p = tmp_path / "a.fai"
    p.write_text("chr1\t1000\t6\t60\t61\nchr2\t500\t1100\t60\t61\n")
    names, lens = load_fai(str(p))
    assert names == ["chr1", "chr2"]
    assert lens == [1000, 500]


def test_degzip_list(tmp_path):
    from rsem_tpu.pipeline.aligners import _degzip_list

    plain = tmp_path / "a.fq"
    plain.write_text("@r\nACGT\n+\nIIII\n")
    gz = tmp_path / "b.fq.gz"
    with gzip.open(gz, "wt") as f:
        f.write("@r2\nTTTT\n+\nIIII\n")
    out = _degzip_list(f"{plain},{gz}", str(tmp_path / "imd"), "m1")
    parts = out.split(",")
    assert parts[0] == str(plain)
    assert parts[1].endswith(".m1.1.fq")
    assert open(parts[1]).read().startswith("@r2")


def test_ofg_roundtrip_and_gibbs_restart():
    """.ofg write -> load reproduces the CSR (EM.cpp:435-457 format), and
    gibbs_inputs_from_ofg rebuilds run_gibbs inputs that yield the same
    posterior as the in-memory path (stage restart)."""
    import numpy as np

    from rsem_tpu.engine.gibbs import GibbsConfig, run_gibbs
    from rsem_tpu.io.ofg import gibbs_inputs_from_ofg, load_ofg, write_ofg
    from rsem_tpu.refprep.transcripts import GroupInfo
    from rsem_tpu.testing import synthetic_arrays_fast

    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=400, M=40, read_len=40, tx_len=300,
        paired=False, has_qual=True, mean_extra_hits=1.0, seed=11)
    rng = np.random.default_rng(5)
    lcp = rng.normal(-18, 2, bundle.hits.n_hits)
    lnp = np.where(rng.random(bundle.hits.n_reads) < 0.5,
                   rng.normal(-25, 2, bundle.hits.n_reads), -np.inf)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.ofg")
        write_ofg(path, ref.M, 7, bundle.hits, lcp, lnp)
        first = open(path).readline().split()
        assert first == [str(ref.M), "7"]

        M2, N0_2, hv, lcp2, lnp2 = gibbs_inputs_from_ofg(path)
        assert (M2, N0_2) == (ref.M, 7)
        assert hv.n_reads == bundle.hits.n_reads
        np.testing.assert_array_equal(hv.sid, bundle.hits.sid)
        np.testing.assert_allclose(lcp2, lcp, rtol=2e-15, atol=1e-12)
        finite = np.isfinite(lnp)
        np.testing.assert_allclose(lnp2[finite], lnp[finite], rtol=2e-15)
        assert not np.isfinite(lnp2[~finite]).any()

        gi = GroupInfo(np.arange(1, ref.M + 2))  # one gene per isoform
        eel = np.concatenate([[0.0], np.full(ref.M, 200.0)])
        mw = np.ones(ref.M + 1)
        cfg = GibbsConfig(burnin=5, nsamples=16, gap=1, n_chains=4, seed=3)
        a = run_gibbs(bundle.hits, lcp, lnp, ref.M, 7, eel, mw, gi, cfg)
        b = run_gibbs(hv, lcp2, lnp2, M2, N0_2, eel, mw, gi, cfg)
        np.testing.assert_allclose(a.pme_c, b.pme_c, atol=1e-6)


def test_countvectors_roundtrip(tmp_path):
    import numpy as np

    from rsem_tpu.io.ofg import load_countvectors, write_countvectors

    cvs = np.random.default_rng(0).integers(0, 50, size=(6, 11)).astype(float)
    p = tmp_path / "x.countvectors"
    write_countvectors(str(p), cvs)
    got = load_countvectors(str(p))
    np.testing.assert_array_equal(got, cvs)
    # reference format: one sample per line, M+1 space-separated ints
    line = open(p).readline().strip().split(" ")
    assert len(line) == 11 and all(t.lstrip("-").isdigit() for t in line)


def test_driver_emits_ofg_and_countvectors(workdir, monkeypatch):
    """--keep-intermediate-files emits .ofg + .countvectors under temp/."""
    monkeypatch.chdir(workdir)
    rc = calc_main([
        "--alignments", "aln.sam", "fref", "s_ofg", "-q", "--no-bam-output",
        "--keep-intermediate-files", "--calc-pme", "--seed", "1",
        "--gibbs-burnin", "5", "--gibbs-number-of-samples", "16",
        "--gibbs-chains", "4",
    ])
    assert rc == 0
    imd = os.path.join("s_ofg.temp", "s_ofg")
    assert os.path.exists(f"{imd}.ofg")
    assert os.path.exists(f"{imd}.countvectors")
    from rsem_tpu.io.ofg import load_countvectors, load_ofg

    M, N0, offs, sid, cp = load_ofg(f"{imd}.ofg")
    assert M > 0 and len(offs) >= 2
    cvs = load_countvectors(f"{imd}.countvectors")
    assert cvs.shape[0] == 16 and cvs.shape[1] == M + 1
