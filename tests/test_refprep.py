"""refprep tests: GTF parsing, extraction, synthesis, preref artifacts."""

import numpy as np
import pytest

from rsem_tpu.refprep import (
    GroupInfo,
    PolyARules,
    Reference,
    Transcripts,
    parse_gtf,
    prepare_reference,
)
from rsem_tpu.refprep.prepare import PrepareConfig
from rsem_tpu.utils.seq import encode, revcomp

GENOME = {
    "chr1": "ACGTACGTACGTACGTACGTAAACCCGGGTTTACGTACGTACGT",
    "chr2": "TTTTGGGGCCCCAAAATTTTGGGGCCCCAAAA",
}

GTF = """\
chr1\tsrc\texon\t1\t8\t.\t+\t.\tgene_id "gA"; transcript_id "tA1";
chr1\tsrc\texon\t13\t20\t.\t+\t.\tgene_id "gA"; transcript_id "tA1";
chr1\tsrc\texon\t1\t20\t.\t+\t.\tgene_id "gA"; transcript_id "tA2";
chr2\tsrc\texon\t5\t16\t.\t-\t.\tgene_id "gB"; transcript_id "tB1"; gene_name "Bgene";
chr1\tsrc\tCDS\t1\t4\t.\t+\t.\tgene_id "gA"; transcript_id "tA1";
"""


@pytest.fixture
def ref_dir(tmp_path):
    (tmp_path / "genome.fa").write_text(
        "".join(f">{name} extra\n{seq}\n" for name, seq in GENOME.items())
    )
    (tmp_path / "anno.gtf").write_text(GTF)
    return tmp_path


def test_parse_gtf_merges_and_sorts(ref_dir):
    ts = parse_gtf(str(ref_dir / "anno.gtf"))
    assert ts.M == 3
    ids = [t.transcript_id for t in sorted(ts.transcripts, key=lambda t: t.sort_key())]
    assert ids == ["tA1", "tA2", "tB1"]
    tA1 = next(t for t in ts.transcripts if t.transcript_id == "tA1")
    assert tA1.structure == [(1, 8), (13, 20)]
    assert tA1.length == 16
    tB1 = next(t for t in ts.transcripts if t.transcript_id == "tB1")
    assert tB1.gene_name == "Bgene"


def test_extract_and_prepare(ref_dir, monkeypatch):
    monkeypatch.chdir(ref_dir)
    ts, ref = prepare_reference(
        ["genome.fa"], "myref", PrepareConfig(gtf="anno.gtf")
    )
    assert ts.M == 3 and ref.M == 3

    # minus-strand extraction is the reverse complement of the spliced exons
    tB1_idx = [t.transcript_id for t in ts.transcripts].index("tB1") + 1
    expected = revcomp(GENOME["chr2"][4:16])
    assert ref.seq_str(tB1_idx) == expected

    # .grp: gA has 2 isoforms, gB has 1
    gi = GroupInfo.load("myref.grp")
    assert gi.m == 2
    assert list(gi.starts) == [1, 3, 4]

    # .ti round-trip
    ts2 = Transcripts.read_ti("myref.ti")
    assert ts2.M == 3
    assert [t.transcript_id for t in ts2.transcripts] == [
        t.transcript_id for t in ts.transcripts
    ]
    assert ts2.transcripts[0].structure == ts.transcripts[0].structure

    # chrlist is sorted with lengths
    lines = open("myref.chrlist").read().splitlines()
    assert lines == [f"chr1\t{len(GENOME['chr1'])}", f"chr2\t{len(GENOME['chr2'])}"]


def test_polya_masks(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "t.fa").write_text(">t1\n" + "ACGT" * 10 + "\n>t2\nACGTACGT\n")
    ref = Reference.from_fasta("t.fa", PolyARules(choice=0, polya_len=5))
    assert ref.M == 2
    assert ref.full_len[1] == 40 and ref.tot_len[1] == 45
    # mask covers the last OLEN-1 = 24 forward seed positions of full region
    assert ref.mask_start[1] == 40 - 24
    assert bool(ref.get_mask(1, 15)) is False
    assert bool(ref.get_mask(1, 16)) is True
    assert bool(ref.get_mask(1, 39)) is True
    assert bool(ref.get_mask(1, 40)) is False  # beyond fullLen: not "masked"
    # short transcript: mask starts at max(fl-24, 0) = 0
    assert ref.mask_start[2] == 0

    # poly(A) appended as base code 0 (A)
    assert (ref.seq_codes(1)[40:] == 0).all()

    # .seq round-trip preserves lengths, masks, sequence
    ref.save_seq("t.seq")
    ref2 = Reference.load_seq("t.seq")
    assert (ref2.full_len == ref.full_len).all()
    assert (ref2.tot_len == ref.tot_len).all()
    assert (ref2.mask_start == ref.mask_start).all()
    assert (ref2.codes == ref.codes).all()


def test_synthesis_allele_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "alleles.fa").write_text(
        ">a1\nACGTACGTAC\n>a2\nACGTACGAAC\n>b1\nTTTTCCCC\n"
    )
    (tmp_path / "map.txt").write_text(
        "gX tX a1\ngX tX a2\ngY tY b1\n"
    )
    from rsem_tpu.refprep import synthesize_reference_transcripts
    from rsem_tpu.refprep.extract import load_allele_to_gene_map

    ts, seqs = synthesize_reference_transcripts(
        "aref", ["alleles.fa"], allele_map=load_allele_to_gene_map("map.txt")
    )
    assert ts.type == 2 and ts.M == 3
    gt = GroupInfo.load("aref.gt")
    ta = GroupInfo.load("aref.ta")
    assert ta.m == 2  # tX (2 alleles), tY (1)
    assert list(ta.starts) == [1, 3, 4]
    assert gt.m == 2  # gX -> [tX], gY -> [tY]


def test_gff3_to_gtf(tmp_path):
    gff3 = tmp_path / "in.gff3"
    gff3.write_text(
        "##gff-version 3\n"
        "chr1\tsrc\tgene\t1\t100\t.\t+\t.\tID=g1;Name=GeneOne\n"
        "chr1\tsrc\tmRNA\t1\t100\t.\t+\t.\tID=t1;Parent=g1;Name=TxOne\n"
        "chr1\tsrc\texon\t1\t40\t.\t+\t.\tParent=t1\n"
        "chr1\tsrc\texon\t35\t100\t.\t+\t.\tParent=t1\n"
        "chr1\tsrc\tncRNA\t1\t50\t.\t+\t.\tID=t2;Parent=g1\n"
        "chr1\tsrc\texon\t1\t50\t.\t+\t.\tParent=t2\n"
    )
    from rsem_tpu.refprep.gff3 import gff3_to_gtf

    out = tmp_path / "out.gtf"
    n = gff3_to_gtf(str(gff3), str(out), rna_patterns="mRNA")
    assert n == 1  # ncRNA filtered by pattern
    ts = parse_gtf(str(out))
    assert ts.M == 1
    assert ts.transcripts[0].structure == [(1, 100)]  # merged overlap
    assert ts.transcripts[0].gene_name == "GeneOne"
    assert ts.transcripts[0].transcript_name == "TxOne"


def test_encode_revcomp():
    assert list(encode("ACGTN")) == [0, 1, 2, 3, 4]
    assert revcomp("AACGTn") == "nACGTT"
