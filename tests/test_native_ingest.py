"""Native BAM ingestion sidecar parity: the C++ record loop
(native/bamparse.cpp) must produce byte-identical bundles to the pure-Python
parse_alignments path (the oracle) on the golden fixtures and on crafted
edge cases (N0/N2 categories, reverse-strand hits, multireads)."""

import gzip
import os
import shutil

import numpy as np
import pytest

from rsem_tpu.io.bamio import BamRecWriter, open_rec_reader
from rsem_tpu.io.sam import parse_alignments
from rsem_tpu.native.bamparse import get_lib

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native bamparse sidecar unavailable"
)


def _sam_to_bam(sam_path, bam_path):
    reader = open_rec_reader(sam_path)
    with BamRecWriter(bam_path, reader.header) as w:
        for rec in reader:
            w.write(rec)
    return reader.header


def _names_from_header(header):
    return [""] + list(header.target_names)


def _assert_bundles_equal(a, b, has_qual, paired):
    # cnt
    assert a.cnt.N0 == b.cnt.N0
    assert a.cnt.N1 == b.cnt.N1
    assert a.cnt.N2 == b.cnt.N2
    assert a.cnt.n_iso_multi == b.cnt.n_iso_multi
    assert a.cnt.n_hits == b.cnt.n_hits
    assert a.cnt.hist == b.cnt.hist
    np.testing.assert_array_equal(a.omit, b.omit)

    # hits
    np.testing.assert_array_equal(a.hits.sid, b.hits.sid)
    np.testing.assert_array_equal(a.hits.dir, b.hits.dir)
    np.testing.assert_array_equal(a.hits.pos, b.hits.pos)
    np.testing.assert_array_equal(a.hits.read_offsets, b.hits.read_offsets)
    if paired:
        np.testing.assert_array_equal(a.hits.insert_len, b.hits.insert_len)

    # reads
    def check_mate(x, y):
        np.testing.assert_array_equal(x.lens, y.lens)
        np.testing.assert_array_equal(x.codes, y.codes)
        np.testing.assert_array_equal(x.lq, y.lq)
        if has_qual:
            np.testing.assert_array_equal(x.quals, y.quals)

    if paired:
        check_mate(a.reads.mate1, b.reads.mate1)
        check_mate(a.reads.mate2, b.reads.mate2)
        np.testing.assert_array_equal(a.reads.lq, b.reads.lq)
    else:
        check_mate(a.reads, b.reads)

    # streaming stats per category
    for cat in range(3):
        sa, sb = a.stats[cat], b.stats[cat]
        assert sa.n_reads == sb.n_reads
        n = min(len(sa.len_counts), len(sb.len_counts))
        np.testing.assert_array_equal(sa.len_counts[:n], sb.len_counts[:n])
        assert sa.len_counts[n:].sum() == 0 and sb.len_counts[n:].sum() == 0
        np.testing.assert_array_equal(sa.q_init, sb.q_init)
        np.testing.assert_array_equal(sa.q_tran, sb.q_tran)
        np.testing.assert_array_equal(sa.noise, sb.noise)


@pytest.mark.parametrize("fixture,read_type", [
    ("aln.sam.gz", 1),
    ("aln.sam.gz", 0),   # same file parsed without qualities
    ("aln_pe.sam.gz", 3),
    ("aln_pe.sam.gz", 2),
])
def test_native_matches_python_on_goldens(tmp_path, fixture, read_type):
    sam = tmp_path / "in.sam"
    with gzip.open(f"{GOLD}/{fixture}", "rb") as fi, open(sam, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    bam = str(tmp_path / "in.bam")
    header = _sam_to_bam(str(sam), bam)
    names = _names_from_header(header)
    kw = dict(has_polya=False, seed_len=25)
    nat = parse_alignments(bam, names, read_type, use_native=True, **kw)
    py = parse_alignments(bam, names, read_type, use_native=False, **kw)
    _assert_bundles_equal(nat, py, read_type in (1, 3), read_type >= 2)


def _write_sam(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_native_categories_and_strand(tmp_path):
    """N0 (unmapped), N2 (filter tag), reverse-strand coordinate flip,
    multi-mapping grouping."""
    header = [
        "@HD\tVN:1.0",
        "@SQ\tSN:t1\tLN:100",
        "@SQ\tSN:t2\tLN:80",
    ]
    q30 = "?" * 10
    recs = [
        # multiread: two alignments, one reverse on t2
        f"r1\t0\tt1\t11\t0\t10M\t*\t0\t0\tACGTACGTAC\t{q30}",
        f"r1\t16\tt2\t21\t0\t10M\t*\t0\t0\tGTACGTACGT\t{q30}",
        # unique forward
        f"r2\t0\tt1\t5\t0\t10M\t*\t0\t0\tAAACCCGGGT\t{q30}",
        # N2: unmapped with XM:i:2
        f"r3\t4\t*\t0\t0\t*\t*\t0\t0\tTTTTTTTTTT\t{q30}\tXM:i:2",
        # N0: unmapped, reverse flag set (payload must be revcomped)
        f"r4\t20\t*\t0\t0\t*\t*\t0\t0\tACGTAAATTT\t{q30}",
    ]
    sam = tmp_path / "x.sam"
    _write_sam(sam, header + recs)
    bam = str(tmp_path / "x.bam")
    hdr = _sam_to_bam(str(sam), bam)
    names = ["", "t1", "t2"]
    kw = dict(has_polya=True, seed_len=5)
    nat = parse_alignments(bam, names, 1, use_native=True, **kw)
    py = parse_alignments(bam, names, 1, use_native=False, **kw)
    _assert_bundles_equal(nat, py, True, False)
    assert nat.cnt.N0 == 1 and nat.cnt.N1 == 2 and nat.cnt.N2 == 1
    # strand-local flip: pos = len(t2) - pos0 - L = 80 - 20 - 10 = 50
    assert nat.hits.sid.tolist() == [1, 2, 1]
    assert nat.hits.dir.tolist() == [0, 1, 0]
    assert nat.hits.pos.tolist() == [10, 50, 4]


def test_native_rejects_gapped(tmp_path):
    header = ["@HD\tVN:1.0", "@SQ\tSN:t1\tLN:100"]
    recs = [f"r1\t0\tt1\t11\t0\t5M2D5M\t*\t0\t0\tACGTACGTAC\t{'?' * 10}"]
    sam = tmp_path / "g.sam"
    _write_sam(sam, header + recs)
    bam = str(tmp_path / "g.bam")
    _sam_to_bam(str(sam), bam)
    names = ["", "t1"]
    with pytest.raises(ValueError, match="gapped"):
        parse_alignments(bam, names, 1, has_polya=False, seed_len=5,
                         use_native=True)


def test_native_paired_checks(tmp_path):
    header = ["@HD\tVN:1.0", "@SQ\tSN:t1\tLN:200"]
    q = "?" * 10
    # proper pair: mate1 fwd at 10, mate2 rev at 60; insert = 60+10-10 = 60
    recs = [
        f"p1\t67\tt1\t11\t0\t10M\t=\t61\t60\tACGTACGTAC\t{q}",
        f"p1\t131\tt1\t61\t0\t10M\t=\t11\t-60\tGGGGGCCCCC\t{q}",
    ]
    sam = tmp_path / "p.sam"
    _write_sam(sam, header + recs)
    bam = str(tmp_path / "p.bam")
    _sam_to_bam(str(sam), bam)
    names = ["", "t1"]
    kw = dict(has_polya=False, seed_len=5)
    nat = parse_alignments(bam, names, 3, use_native=True, **kw)
    py = parse_alignments(bam, names, 3, use_native=False, **kw)
    _assert_bundles_equal(nat, py, True, True)
    assert nat.hits.insert_len.tolist() == [60]


@pytest.mark.parametrize("fixture,read_type", [
    ("aln.sam.gz", 1),
    ("aln.sam.gz", 0),
    ("aln_pe.sam.gz", 3),
    ("aln_pe.sam.gz", 2),
])
def test_native_sam_text_matches_python(tmp_path, fixture, read_type):
    """The SAM-text sidecar path (samparse_run) is byte-identical to the
    Python SAM loop — same oracle contract as the BAM path, both on plain
    and gzip-compressed text."""
    sam = tmp_path / "in.sam"
    with gzip.open(f"{GOLD}/{fixture}", "rb") as fi, open(sam, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    names = [""] + [l.split("SN:")[1].split("\t")[0]
                    for l in open(sam).read().splitlines()
                    if l.startswith("@SQ")]
    kw = dict(has_polya=False, seed_len=25)
    nat = parse_alignments(str(sam), names, read_type, use_native=True, **kw)
    py = parse_alignments(str(sam), names, read_type, use_native=False, **kw)
    _assert_bundles_equal(nat, py, read_type in (1, 3), read_type >= 2)
    # gzip-compressed text goes through the in-sidecar whole-stream inflate
    gz = tmp_path / "in2.sam.gz"
    shutil.copyfile(f"{GOLD}/{fixture}", gz)
    nat_gz = parse_alignments(str(gz), names, read_type, use_native=True, **kw)
    _assert_bundles_equal(nat_gz, py, read_type in (1, 3), read_type >= 2)
