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
