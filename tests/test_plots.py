"""Plotting subsystem: plot-model PDF pages and transcript wiggle plots
(driver materializes sorted bam/readdepth; gene pages; --show-unique)."""

import os

import pytest

from rsem_tpu.pipeline.calculate_expression import main as calc_main
from rsem_tpu.pipeline.prepare_reference import main as prep_main
from rsem_tpu.plots import plot_model, plot_transcript_wiggles

from test_em_end_to_end import T1, T2, T3, _make_reads


def _count_pdf_pages(path: str) -> int:
    import re

    data = open(path, "rb").read()
    assert data.startswith(b"%PDF")
    m = re.search(rb"/Count (\d+)", data)
    return int(m.group(1)) if m else 0


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    d = tmp_path_factory.mktemp("plots")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        (d / "tx.fa").write_text(f">t1\n{T1}\n>t2\n{T2}\n>t3\n{T3}\n")
        (d / "map.txt").write_text("gA t1\ngA t2\ngB t3\n")
        header = ["@HD\tVN:1.0"]
        for name, seq in [("t1", T1), ("t2", T2), ("t3", T3)]:
            header.append(f"@SQ\tSN:{name}\tLN:{len(seq)}")
        lines = header + _make_reads({"t1": 40, "t2": 80, "t3": 40})
        (d / "aln.sam").write_text("\n".join(lines) + "\n")
        assert prep_main(
            ["--transcript-to-gene-map", "map.txt", "tx.fa", "pref", "-q"]
        ) == 0
        assert calc_main(
            ["--alignments", "aln.sam", "--estimate-rspd", "pref",
             "psample", "-q"]
        ) == 0
    finally:
        os.chdir(cwd)
    return d


def test_plot_model(sample, monkeypatch):
    monkeypatch.chdir(sample)
    plot_model("psample", "model.pdf")
    # single-end qual model (no user fragment dist => no mld page) with
    # estimated RSPD: fragment-length page, RSPD page, quality page,
    # alignment-stats page
    assert _count_pdf_pages("model.pdf") == 4


def test_plot_model_missing_stat_dir(sample, monkeypatch):
    monkeypatch.chdir(sample)
    with pytest.raises(FileNotFoundError):
        plot_model("nosuchsample", "x.pdf")


def test_wiggles_transcript_list(sample, monkeypatch):
    monkeypatch.chdir(sample)
    (sample / "ids.txt").write_text("t1\nt2\nt3\nbogus\n")
    msgs = []
    plot_transcript_wiggles("psample", "ids.txt", "wig.pdf",
                            log=msgs.append)
    # driver materialized its inputs
    assert os.path.exists("psample.transcript.sorted.bam")
    assert os.path.exists("psample.transcript.readdepth")
    assert _count_pdf_pages("wig.pdf") == 1  # 3 plots fit one 3x2 page
    assert any("bogus" in m for m in msgs)


def test_wiggles_gene_list_show_unique(sample, monkeypatch):
    monkeypatch.chdir(sample)
    (sample / "genes.txt").write_text("gA\ngB\n")
    plot_transcript_wiggles("psample", "genes.txt", "gwig.pdf",
                            gene_list=True, show_unique=True,
                            log=lambda *_: None)
    assert os.path.exists("psample.uniq.transcript.readdepth")
    assert _count_pdf_pages("gwig.pdf") == 2  # one page per gene


def test_wiggles_flag_validation(sample, monkeypatch):
    monkeypatch.chdir(sample)
    (sample / "one.txt").write_text("t1\n")
    with pytest.raises(ValueError):
        plot_transcript_wiggles("psample", "one.txt", "x.pdf",
                                transcript_list=True)
