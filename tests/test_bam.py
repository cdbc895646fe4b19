"""BAM output subsystem tests: codec round-trip, posterior writeback (ZW),
genome-coordinate conversion (tr2chr parity cases), sort+index, wiggle,
and the alignment utilities (get-unique / validator / scan)."""

import gzip
import os

import numpy as np
import pytest

from rsem_tpu.io.bamio import (
    BamHeader,
    BamRec,
    BamRecReader,
    BamRecWriter,
    open_rec_reader,
    prb_to_mapq,
    reg2bin,
)
from rsem_tpu.io.bamsort import sort_bam, strnum_key
from rsem_tpu.io.bam_writer import sample_hit_weights, write_transcript_bam
from rsem_tpu.io.tbam2gbam import _reverse_md, tbam2gbam, tr2chr
from rsem_tpu.io.wiggle import build_depths, bam2wig, bam2readdepth
from rsem_tpu.io.hits import HitArrays
from rsem_tpu.pipeline.bamtools import (
    get_unique,
    scan_for_paired_end_reads,
    validate_alignments,
)
from rsem_tpu.refprep.transcripts import Transcript

from test_em_end_to_end import T1, T2, T3, _make_reads


def _header():
    return BamHeader(
        "@HD\tVN:1.4\n@SQ\tSN:t1\tLN:100\n@SQ\tSN:t2\tLN:200\n",
        ["t1", "t2"],
        [100, 200],
    )


def _rec(name="r1", flag=0, tid=0, pos=10, cigar="5M", seq="ACGTN",
         qual="IIIII", tags=(), mapq=30):
    fields = [name, str(flag), "t1" if tid == 0 else "t2", str(pos + 1),
              str(mapq), cigar, "*", "0", "0", seq, qual] + list(tags)
    return BamRec.from_sam_fields(fields, {"t1": 0, "t2": 1})


class TestCodec:
    def test_round_trip(self, tmp_path):
        hdr = _header()
        recs = [
            _rec(tags=["NM:i:2", "ZW:f:0.5", "XS:A:+", "MD:Z:5"]),
            _rec(name="r2", flag=16, tid=1, pos=50),
            _rec(name="u1", flag=4, tid=-1, pos=-1, cigar="*"),
        ]
        # unmapped: fix rname/pos fields
        recs[2].tid = -1
        recs[2].pos = -1
        path = str(tmp_path / "t.bam")
        with BamRecWriter(path, hdr) as w:
            for r in recs:
                w.write(r)
        rd = BamRecReader(path)
        assert rd.header.target_names == ["t1", "t2"]
        got = list(rd)
        assert len(got) == 3
        assert got[0].name == "r1" and got[0].pos == 10
        assert got[0].get_tag("NM") == 2
        assert got[0].get_tag("ZW") == pytest.approx(0.5)
        assert got[0].get_tag("XS") == "+"
        assert got[0].get_tag("MD") == "5"
        assert got[0].seq_string() == "ACGTN"
        assert got[1].is_rev and got[1].tid == 1
        assert not got[2].is_mapped
        # stdlib gzip must read to EOF (valid BGZF EOF marker)
        with gzip.open(path, "rb") as g:
            g.read()

    def test_tag_mutation(self):
        r = _rec(tags=["ZW:f:0.25", "NM:i:1"])
        r.set_float_tag("ZW", 0.75)
        assert r.get_tag("ZW") == pytest.approx(0.75)
        assert r.get_tag("NM") == 1
        r.del_tag("NM")
        assert r.get_tag("NM") is None
        r.set_char_tag("XS", "-")
        assert r.get_tag("XS") == "-"
        # append when missing
        r2 = _rec()
        r2.set_float_tag("ZW", 0.125)
        assert r2.get_tag("ZW") == pytest.approx(0.125)

    def test_reverse_complement(self):
        r = _rec(seq="AACGT", qual="ABCDE")
        r.reverse_complement()
        assert r.seq_string() == "ACGTT"
        assert r.qual == bytes(ord(c) - 33 for c in "EDCBA")

    def test_prb_to_mapq(self):
        assert prb_to_mapq(1.0) == 100
        assert prb_to_mapq(0.9) == 10
        assert prb_to_mapq(0.0) == 0

    def test_reg2bin(self):
        assert reg2bin(0, 1) == 4681
        assert reg2bin(0, 1 << 15) == 585


class TestSampling:
    def test_sample_weights_deterministic(self):
        # one read, two hits, noise ~ 0
        hits = HitArrays.from_lists([[(1, 0), (2, 0)]] * 1000, paired=False)
        frac = np.tile([0.7, 0.3], 1000)
        noise = np.zeros(1000)
        w = sample_hit_weights(hits, frac, noise, seed=7)
        per_read = w.reshape(1000, 2)
        assert set(per_read.sum(axis=1)) == {1.0}
        # frequency ≈ posterior
        assert per_read[:, 0].mean() == pytest.approx(0.7, abs=0.05)

    def test_sample_noise_and_zero(self):
        hits = HitArrays.from_lists([[(1, 0)]] * 500, paired=False)
        frac = np.zeros(500)
        w = sample_hit_weights(hits, frac, np.ones(500), seed=3)
        assert w.sum() == 0  # noise always chosen
        w2 = sample_hit_weights(hits, np.zeros(500), np.zeros(500), seed=3)
        assert w2.sum() == 0  # all-zero posterior stays zero


class TestTr2Chr:
    TR_PLUS = Transcript(
        transcript_id="tx", gene_id="g", seqname="chr1", strand="+",
        structure=[(11, 18), (31, 40)],
    )

    def test_within_one_exon(self):
        pos, cig = tr2chr(self.TR_PLUS, 2, 5)
        assert pos == 11  # 0-based: exon starts at 10, offset 1
        assert [(int(v) >> 4, int(v) & 0xF) for v in cig] == [(4, 0)]

    def test_spliced(self):
        # [5, 12] spans exon1 tail (5..8) and exon2 head (9..12)
        pos, cig = tr2chr(self.TR_PLUS, 5, 12)
        assert pos == 14
        assert [(int(v) >> 4, int(v) & 0xF) for v in cig] == [
            (4, 0), (12, 3), (4, 0),
        ]

    def test_polya_overhang(self):
        # transcript length 18; read [15, 22] runs 4 bases into polyA
        pos, cig = tr2chr(self.TR_PLUS, 15, 22)
        assert [(int(v) >> 4, int(v) & 0xF) for v in cig] == [(4, 0), (4, 1)]

    def test_minus_strand_flip(self):
        tr = Transcript(
            transcript_id="tx", gene_id="g", seqname="chr1", strand="-",
            structure=[(11, 18)],
        )
        pos, cig = tr2chr(tr, 1, 4)  # first 4 bases = genome tail
        assert pos == 14
        assert [(int(v) >> 4, int(v) & 0xF) for v in cig] == [(4, 0)]

    def test_reverse_md(self):
        assert _reverse_md("10A5") == "5T10"
        assert _reverse_md("3^ACG4") == "4^CGT3"
        assert _reverse_md("20") == "20"


def _write_sam(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


SAM_HEADER = ["@HD\tVN:1.0", "@SQ\tSN:t1\tLN:100", "@SQ\tSN:t2\tLN:200"]


class TestBamTools:
    def test_get_unique(self, tmp_path):
        lines = SAM_HEADER + [
            "u1\t0\tt1\t1\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
            "m1\t0\tt1\t1\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
            "m1\t256\tt2\t1\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
            "x1\t4\t*\t0\t0\t*\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
        ]
        inp = str(tmp_path / "in.sam")
        outp = str(tmp_path / "out.bam")
        _write_sam(inp, lines)
        n = get_unique(inp, outp)
        assert n == 1
        got = list(BamRecReader(outp))
        assert [r.name for r in got] == ["u1"]

    def test_validator_accepts_and_rejects(self, tmp_path):
        good = SAM_HEADER + [
            "r1\t0\tt1\t1\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
        ]
        inp = str(tmp_path / "good.sam")
        _write_sam(inp, good)
        assert validate_alignments(inp, log=lambda *_: None)

        bad = SAM_HEADER + [
            "r1\t0\tt1\t1\t30\t5M2I3M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
        ]
        inp2 = str(tmp_path / "bad.sam")
        _write_sam(inp2, bad)
        assert not validate_alignments(inp2, log=lambda *_: None)

        # out-of-boundary
        bad2 = SAM_HEADER + [
            "r1\t0\tt1\t98\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
        ]
        inp3 = str(tmp_path / "bad2.sam")
        _write_sam(inp3, bad2)
        assert not validate_alignments(inp3, log=lambda *_: None)

    def test_scan_for_paired_end_reads(self, tmp_path):
        # mates out of order; scan must reorder mate1-first adjacent
        lines = SAM_HEADER + [
            "p1\t131\tt1\t41\t30\t10M\t=\t1\t-50\tACGTACGTAC\tIIIIIIIIII",
            "p1\t67\tt1\t1\t30\t10M\t=\t41\t50\tACGTACGTAC\tIIIIIIIIII",
        ]
        inp = str(tmp_path / "pe.sam")
        outp = str(tmp_path / "pe.bam")
        _write_sam(inp, lines)
        n = scan_for_paired_end_reads(inp, outp)
        assert n == 2
        got = list(BamRecReader(outp))
        assert got[0].is_read1 and got[1].is_read2

    def test_sort_coordinate_and_index(self, tmp_path):
        lines = SAM_HEADER + [
            "b\t0\tt2\t5\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
            "a\t0\tt1\t50\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
            "c\t0\tt1\t2\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
            "u\t4\t*\t0\t0\t*\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
        ]
        inp = str(tmp_path / "in.sam")
        outp = str(tmp_path / "sorted.bam")
        _write_sam(inp, lines)
        bai = sort_bam(inp, outp, by="coordinate", build_index=True)
        got = list(BamRecReader(outp))
        assert [r.name for r in got] == ["c", "a", "b", "u"]
        assert bai and os.path.exists(bai)
        assert open(bai, "rb").read(4) == b"BAI\x01"

    def test_sort_by_name_natural(self, tmp_path):
        assert strnum_key("r2") < strnum_key("r10")
        lines = SAM_HEADER + [
            f"r{i}\t0\tt1\t1\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII"
            for i in (10, 2, 1)
        ]
        inp = str(tmp_path / "in.sam")
        outp = str(tmp_path / "ns.bam")
        _write_sam(inp, lines)
        sort_bam(inp, outp, by="name")
        got = [r.name for r in BamRecReader(outp)]
        assert got == ["r1", "r2", "r10"]


class TestWiggle:
    def _bam(self, tmp_path):
        lines = SAM_HEADER + [
            "r1\t0\tt1\t1\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tZW:f:0.5",
            "r1\t0\tt1\t6\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tZW:f:0.5",
            "r2\t0\tt1\t1\t30\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",  # no ZW
        ]
        inp = str(tmp_path / "w.sam")
        _write_sam(inp, lines)
        return inp

    def test_depths_fractional(self, tmp_path):
        inp = self._bam(tmp_path)
        names, lens, depths = build_depths(inp)
        d = depths[0]
        assert d[0] == pytest.approx(0.5)  # only first alignment
        assert d[7] == pytest.approx(1.0)  # overlap of both
        assert d[12] == pytest.approx(0.5)
        assert 1 not in depths  # t2 untouched

    def test_depths_unit_weight(self, tmp_path):
        inp = self._bam(tmp_path)
        _, _, depths = build_depths(inp, no_fractional_weight=True)
        assert depths[0][0] == pytest.approx(2.0)  # r1 + r2 (ZW ignored)

    def test_wig_and_readdepth_files(self, tmp_path):
        inp = self._bam(tmp_path)
        wig = str(tmp_path / "o.wig")
        bam2wig(inp, wig, "trackname")
        content = open(wig).read()
        assert content.startswith('track type=wiggle_0 name="trackname"')
        assert "fixedStep chrom=t1 start=1 step=1" in content

        rd = str(tmp_path / "o.rd")
        bam2readdepth(inp, rd)
        rows = open(rd).read().splitlines()
        assert rows[0].startswith("t1\t100\t0.5 0.5")
        assert rows[1] == "t2\t200\tNA"


@pytest.fixture(scope="module")
def em_sample(tmp_path_factory):
    """Prepared reference + EM run + transcript BAM via the full pipeline."""
    from rsem_tpu.pipeline.calculate_expression import main as calc_main
    from rsem_tpu.pipeline.prepare_reference import main as prep_main

    d = tmp_path_factory.mktemp("bamwb")
    (d / "tx.fa").write_text(f">t1\n{T1}\n>t2\n{T2}\n>t3\n{T3}\n")
    (d / "map.txt").write_text("gA t1\ngA t2\ngB t3\n")
    header = ["@HD\tVN:1.0"]
    for name, seq in [("t1", T1), ("t2", T2), ("t3", T3)]:
        header.append(f"@SQ\tSN:{name}\tLN:{len(seq)}")
    lines = header + _make_reads({"t1": 40, "t2": 80, "t3": 40})
    (d / "aln.sam").write_text("\n".join(lines) + "\n")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        prep_main(["--transcript-to-gene-map", "map.txt", "tx.fa", "bref",
                   "-q"])
        calc_main(["--alignments", "aln.sam", "bref", "bsample", "-q"])
    finally:
        os.chdir(cwd)
    return d


class TestTranscriptBamWriteback:
    def test_zw_weights_sum_to_one(self, em_sample):
        path = str(em_sample / "bsample.transcript.bam")
        assert os.path.exists(path)
        per_read = {}
        for rec in BamRecReader(path):
            if not rec.is_mapped:
                assert rec.get_tag("ZW") is None
                continue
            zw = rec.get_tag("ZW")
            assert zw is not None
            per_read.setdefault(rec.name, 0.0)
            per_read[rec.name] += zw
            assert rec.mapq == prb_to_mapq(zw)
        # theta[0] (noise) is tiny for perfect-match reads
        sums = np.array(list(per_read.values()))
        assert np.all(sums <= 1.0 + 1e-5)
        assert sums.mean() == pytest.approx(1.0, abs=1e-3)

    def test_sampling_for_bam(self, em_sample, tmp_path):
        from rsem_tpu.pipeline.calculate_expression import main as calc_main

        cwd = os.getcwd()
        os.chdir(em_sample)
        try:
            calc_main([
                "--alignments", "aln.sam", "bref", "bsample_s", "-q",
                "--sampling-for-bam", "--seed", "11",
            ])
        finally:
            os.chdir(cwd)
        path = str(em_sample / "bsample_s.transcript.bam")
        per_read = {}
        for rec in BamRecReader(path):
            if not rec.is_mapped:
                continue
            zw = rec.get_tag("ZW")
            assert zw in (0.0, 1.0)
            per_read.setdefault(rec.name, 0.0)
            per_read[rec.name] += zw
        assert set(per_read.values()) <= {0.0, 1.0}


class TestGenomeBam:
    def test_output_genome_bam(self, tmp_path, monkeypatch):
        """GTF reference -> transcript alignments -> genome BAM with spliced
        cigars + XS tags."""
        from rsem_tpu.pipeline.calculate_expression import main as calc_main
        from rsem_tpu.pipeline.prepare_reference import main as prep_main

        # genome: 2 exons for tS (plus), 1 exon for tR (minus)
        exon1 = "ACGTACGTACGTACGTACGT"  # chr1:1-20
        intron = "GGGGGGGGGG"  # 21-30
        exon2 = "TTTTCCCCAAAATTTTCCCC"  # 31-50
        chr1 = exon1 + intron + exon2
        gtf = (
            'chr1\tsrc\texon\t1\t20\t.\t+\t.\tgene_id "g1"; transcript_id "tS";\n'
            'chr1\tsrc\texon\t31\t50\t.\t+\t.\tgene_id "g1"; transcript_id "tS";\n'
        )
        monkeypatch.chdir(tmp_path)
        (tmp_path / "genome.fa").write_text(f">chr1\n{chr1}\n")
        (tmp_path / "anno.gtf").write_text(gtf)
        prep_main(["--gtf", "anno.gtf", "genome.fa", "gref", "-q"])

        tx = exon1 + exon2
        # 30bp read spanning the splice junction: tx[5:35] (>= seed length)
        frag = tx[5:35]
        sam = [
            "@HD\tVN:1.0",
            f"@SQ\tSN:tS\tLN:{len(tx)}",
            f"j1\t0\ttS\t6\t30\t30M\t*\t0\t0\t{frag}\t{'I' * 30}",
        ]
        (tmp_path / "aln.sam").write_text("\n".join(sam) + "\n")
        calc_main(["--alignments", "aln.sam", "gref", "gsample", "-q",
                   "--output-genome-bam", "--sort-bam-by-coordinate"])

        got = list(BamRecReader("gsample.genome.bam"))
        assert len(got) == 1
        r = got[0]
        assert r.pos == 5  # genome 0-based
        assert [(ln, op) for ln, op in r.cigar_ops()] == [
            (15, "M"), (10, "N"), (15, "M"),
        ]
        assert r.get_tag("XS") == "+"
        assert r.get_tag("ZW") == pytest.approx(1.0)
        assert os.path.exists("gsample.genome.sorted.bam")
        assert os.path.exists("gsample.genome.sorted.bam.bai")
        assert os.path.exists("gsample.transcript.sorted.bam.bai")


class TestUtilities:
    def test_generate_data_matrix(self, tmp_path):
        import io as _io

        from rsem_tpu.pipeline.utilities import generate_data_matrix

        for s in ("a", "b"):
            (tmp_path / f"{s}.genes.results").write_text(
                "gene_id\ttranscript_id(s)\tlength\teffective_length\t"
                "expected_count\tTPM\tFPKM\n"
                f"g1\tt1\t100\t80\t{10 if s == 'a' else 20}.00\t1.0\t1.0\n"
            )
        buf = _io.StringIO()
        generate_data_matrix(
            [str(tmp_path / "a.genes.results"), str(tmp_path / "b.genes.results")],
            buf,
        )
        rows = buf.getvalue().splitlines()
        assert rows[1].split("\t") == ['"g1"', "10.00", "20.00"]

    def test_trinity_map(self, tmp_path):
        from rsem_tpu.pipeline.utilities import extract_trinity_gene_map

        fa = tmp_path / "t.fa"
        fa.write_text(">comp0_c0_seq1 len=100\nACGT\n>comp0_c0_seq2\nACGT\n")
        out = tmp_path / "map.txt"
        extract_trinity_gene_map(str(fa), str(out), log=lambda *_: None)
        lines = out.read_text().splitlines()
        assert lines == [
            "comp0_c0\tcomp0_c0_seq1", "comp0_c0\tcomp0_c0_seq2",
        ]

    def test_primary_assembly(self, tmp_path):
        from rsem_tpu.pipeline.utilities import refseq_extract_primary_assembly

        inp = tmp_path / "in.fna"
        inp.write_text(
            ">chr1 Primary Assembly\nACGT\n>alt1 ALT_REF\nTTTT\n"
        )
        out = tmp_path / "out.fna"
        refseq_extract_primary_assembly(str(inp), str(out))
        assert out.read_text() == ">chr1 Primary Assembly\nACGT\n"
