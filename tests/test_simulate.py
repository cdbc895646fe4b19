"""Simulator tests: distributional checks + quantification round-trip."""

import numpy as np
import pytest

from rsem_tpu.engine import EMConfig, run_em
from rsem_tpu.engine.simulate import simulate_reads
from rsem_tpu.io import parse_alignments
from rsem_tpu.io.reads import ReadStats
from rsem_tpu.model import GenerativeModel, LenDist, ModelSpec
from rsem_tpu.refprep.reference import Reference
from rsem_tpu.refprep.transcripts import GroupInfo
from rsem_tpu.utils.seq import decode


@pytest.fixture(scope="module")
def sim_model():
    rng = np.random.default_rng(42)
    seqs = [decode(rng.integers(0, 4, size=l)) for l in (400, 300, 250)]
    ref = Reference(["t1", "t2", "t3"], seqs, [0, 0, 0])
    spec = ModelSpec(model_type=1, seed_len=25)
    model = GenerativeModel(spec, ref)
    # hand-build model state: read length 50, flat qualities
    ld = LenDist(1, 1000)
    ld.init()
    ld.update(np.array([50]), np.array([1.0]))
    ld.finish()
    model.gld = ld
    model.qd.update_counts(
        np.eye(100)[30] * 10, np.outer(np.eye(100)[30], np.eye(100)[30]) * 10
    )
    model.qd.finish()
    model.npro.calc_init_params()
    model.freeze_windows()
    model.calc_mw()
    return ref, model


def test_simulate_distribution(sim_model, tmp_path):
    ref, model = sim_model
    tpm = np.array([0.0, 500_000.0, 300_000.0, 200_000.0])
    res = simulate_reads(
        model, ref, tpm, theta0=0.05, n_reads=20_000,
        out_prefix=str(tmp_path / "sim"), seed=3, chunk=20_000,
    )
    assert res.counts.sum() == 20_000
    # expected split: theta_i ~ tpm_i * eel_i
    eel = model.calc_eel()
    expect = tpm * eel
    expect = expect[1:] / expect[1:].sum() * 0.95 * 20_000
    np.testing.assert_allclose(res.counts[1:], expect, rtol=0.08)
    assert res.counts[0] == pytest.approx(1000, rel=0.2)

    # FASTQ well-formed with provenance names
    lines = (tmp_path / "sim.fq").read_text().splitlines()
    assert len(lines) == 4 * 20_000
    name = lines[0][1:]
    rid, d, sid, pos = (int(x) for x in name.split("_"))
    assert 0 <= sid <= 3 and d in (0, 1)
    assert len(lines[1]) == 50 and len(lines[3]) == 50
    assert lines[3][0] == chr(30 + 33)  # quality 30


def test_simulate_roundtrip_quantification(sim_model, tmp_path):
    """Re-quantifying simulated reads recovers the true counts."""
    ref, model = sim_model
    tpm = np.array([0.0, 600_000.0, 250_000.0, 150_000.0])
    res = simulate_reads(
        model, ref, tpm, theta0=0.02, n_reads=8_000,
        out_prefix=str(tmp_path / "rt"), seed=9, chunk=8_000,
    )
    # build SAM using provenance (true alignment per read)
    lines = ["@HD\tVN:1.0"]
    for i, name in enumerate(["t1", "t2", "t3"], start=1):
        lines.append(f"@SQ\tSN:{name}\tLN:{int(ref.tot_len[i])}")
    fq = (tmp_path / "rt.fq").read_text().splitlines()
    for k in range(0, len(fq), 4):
        name = fq[k][1:]
        seq = fq[k + 1]
        qual = fq[k + 3]
        rid, d, sid, pos = (int(x) for x in name.split("_"))
        if sid == 0:
            lines.append(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t{qual}")
        else:
            flag = 16 if d == 1 else 0
            if d == 1:
                comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
                seq_s = "".join(comp[c] for c in reversed(seq))
                qual_s = qual[::-1]
                # provenance pos is strand-local; SAM POS is forward-strand
                sam_pos = int(ref.tot_len[sid]) - pos - len(seq)
            else:
                seq_s, qual_s = seq, qual
                sam_pos = pos
            lines.append(
                f"{name}\t{flag}\t{ref.names[sid]}\t{sam_pos + 1}\t255\t"
                f"{len(seq)}M\t*\t0\t0\t{seq_s}\t{qual_s}"
            )
    sam = tmp_path / "rt.sam"
    sam.write_text("\n".join(lines) + "\n")

    bundle = parse_alignments(str(sam), ref.names, 1, False, 25)
    spec = ModelSpec(model_type=1, seed_len=25)
    qmodel = GenerativeModel(spec, ref)
    qmodel.estimate_from_stats(bundle.stats)
    em = run_em(qmodel, ref, bundle, EMConfig())

    # counts recovered within a few percent (unique alignments)
    np.testing.assert_allclose(
        em.counts[1:], res.counts[1:], rtol=0.05, atol=20
    )
