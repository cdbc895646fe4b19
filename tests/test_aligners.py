"""Aligner command construction (bowtie/bowtie2/STAR/HISAT2) and the
read-file CLI surface of calculate-expression / prepare-reference."""

import pytest

from rsem_tpu.pipeline.aligners import (
    AlignerConfig,
    bowtie2_build_command,
    bowtie2_command,
    bowtie_build_command,
    bowtie_command,
    build_alignment_command,
    hisat2_build_command,
    hisat2_hca_command,
    star_command,
    star_genome_generate_command,
)


class TestBowtie:
    def test_single_end_quals(self):
        cfg = AlignerConfig(n_threads=4)
        c = bowtie_command(cfg, "ref", "smp", "smp.temp/smp", "r1.fq")
        assert c.startswith("bowtie -q --phred33-quals")
        assert "-n 2 -e 99999999 -l 25" in c
        assert "-p 4 -a -m 200 -S" in c
        assert " ref r1.fq " in c
        assert "-I" not in c  # single-end: no insert bounds
        assert c.endswith("2> smp.log")

    def test_paired_no_qual_phred64_strand(self):
        cfg = AlignerConfig(no_qualities=True, phred33=False, phred64=True,
                            probF=1.0, bowtie_path="/opt/bt",
                            fragment_length_min=5, fragment_length_max=800,
                            bowtie_chunkmbs=256)
        c = bowtie_command(cfg, "ref", "smp", "imd", "a1.fa,a2.fa", "b1.fa")
        assert c.startswith("/opt/bt/bowtie -f --phred64-quals")
        assert "-I 5 -X 800" in c
        assert "--chunkmbs 256" in c
        assert "--norc" in c
        assert "-1 a1.fa,a2.fa -2 b1.fa" in c


class TestBowtie2:
    def test_defaults(self):
        cfg = AlignerConfig(aligner="bowtie2")
        c = bowtie2_command(cfg, "ref", "smp", "imd", "r1.fq")
        assert c.startswith("bowtie2 -q --phred33 --sensitive")
        assert "--dpad 0 --gbar 99999999 --mp 1,1 --np 1" in c
        assert "--score-min L,0,-0.1" in c
        assert "-k 200" in c
        assert "-x ref -U r1.fq" in c

    def test_paired_very_sensitive_reverse(self):
        cfg = AlignerConfig(aligner="bowtie2", probF=0.0,
                            bowtie2_sensitivity_level="very_sensitive")
        c = bowtie2_command(cfg, "ref", "smp", "imd", "m1.fq", "m2.fq")
        assert "--very-sensitive" in c
        assert "--no-mixed --no-discordant" in c
        assert "--nofw" in c
        assert "-1 m1.fq -2 m2.fq" in c


class TestStar:
    def test_encode3_params(self):
        cfg = AlignerConfig(aligner="star", n_threads=8)
        c = star_command(cfg, "refs/ref", "smp", "smp.temp/smp", "r1.fq",
                         "r2.fq")
        assert "--genomeDir refs" in c
        assert "--outFilterMultimapNmax 20" in c
        assert "--quantMode TranscriptomeSAM" in c
        assert "--outSAMtype BAM Unsorted" in c
        assert "--runThreadN 8" in c
        assert "--readFilesIn r1.fq r2.fq" in c
        assert "--outFileNamePrefix smp.temp/smp" in c

    def test_gzip(self):
        cfg = AlignerConfig(aligner="star", star_gzipped_read_file=True)
        c = star_command(cfg, "ref", "smp", "imd", "r1.fq.gz")
        assert "--readFilesCommand zcat" in c


class TestHisat2:
    def test_hca_settings(self):
        cfg = AlignerConfig(aligner="hisat2-hca")
        c = hisat2_hca_command(cfg, "ref", "out/smp", "imd", "r1.fq")
        assert "--rg-id=smp" in c
        assert "--no-spliced-alignment --no-softclip --seed 12345" in c
        assert "-k 10 --secondary" in c
        assert "-x ref -U r1.fq" in c


class TestDispatchAndBuilds:
    def test_dispatch(self):
        cfg = AlignerConfig(aligner="star")
        assert build_alignment_command(cfg, "r", "s", "i", "m").startswith(
            "STAR")
        with pytest.raises(ValueError):
            build_alignment_command(AlignerConfig(aligner="nope"), "r", "s",
                                    "i", "m")

    def test_index_builds(self):
        assert bowtie_build_command("", "ref") == \
            "bowtie-build -f ref.n2g.idx.fa ref"
        assert bowtie2_build_command("", "ref", n_threads=4) == \
            "bowtie2-build -f --threads 4 ref.idx.fa ref"
        assert hisat2_build_command("/h2", "ref", quiet=True) == \
            "/h2/hisat2-build -f -q ref.idx.fa ref"
        c = star_genome_generate_command("", "refs/ref", ["g.fa"], "a.gtf")
        assert "--runMode genomeGenerate" in c
        assert "--genomeDir refs" in c
        assert "--sjdbGTFfile a.gtf" in c
        assert "--sjdbOverhang 100" in c


class TestCLIResolution:
    def test_missing_aligner_binary_errors(self, tmp_path, monkeypatch):
        from rsem_tpu.pipeline.calculate_expression import main as calc_main
        monkeypatch.chdir(tmp_path)
        with pytest.raises(FileNotFoundError, match="bowtie"):
            calc_main(["reads.fq", "ref", "smp", "-q"])

    def test_alignments_flag_styles(self):
        from rsem_tpu.pipeline.calculate_expression import build_parser, \
            _resolve_inputs
        p = build_parser()
        # --alignments <file> ref sample
        a = p.parse_args(["--alignments", "x.sam", "ref", "smp"])
        assert _resolve_inputs(a) == ("x.sam", None, "ref", "smp")
        # --alignments with positional input (reference style)
        a = p.parse_args(["--alignments", "--", "x.bam", "ref", "smp"])
        assert _resolve_inputs(a) == ("x.bam", None, "ref", "smp")
        # read-file modes
        a = p.parse_args(["r1.fq", "ref", "smp"])
        assert _resolve_inputs(a) == (None, ("r1.fq", None), "ref", "smp")
        a = p.parse_args(["--paired-end", "r1.fq", "r2.fq", "ref", "smp"])
        assert _resolve_inputs(a) == (None, ("r1.fq", "r2.fq"), "ref", "smp")
