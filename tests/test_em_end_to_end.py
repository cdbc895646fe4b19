"""End-to-end EM on synthetic data: SAM -> parse -> EM -> results.

Uses a hand-built transcript set with shared and unique regions so that
multi-mapping resolution is exercised, plus a brute-force float64 python EM to
check the device pipeline's posteriors.
"""

import numpy as np
import pytest

from rsem_tpu.engine import EMConfig, run_em
from rsem_tpu.io import parse_alignments
from rsem_tpu.io.results import calc_expression_values, polish_theta
from rsem_tpu.model.generative import GenerativeModel
from rsem_tpu.model.spec import ModelSpec
from rsem_tpu.refprep.reference import PolyARules, Reference
from rsem_tpu.utils.seq import revcomp

RNG = np.random.default_rng(7)

# t1 and t2 share a 40-base prefix; t3 is distinct
SHARED = "ACGTTGCAACGGATCCTAGGCATCGATCGGATTCAGGCAT"
T1 = SHARED + "TTGACCGGTAACGGTACCGT" * 3
T2 = SHARED + "GGCATCCATGGCAATTCCGG" * 5
T3 = "TACCGGAATTCGCGGCCGCA" * 6


def _make_reads(n_per, read_len=30):
    """Perfect-match reads with known provenance; returns SAM records."""
    txs = {"t1": T1, "t2": T2, "t3": T3}
    sam_lines = []
    rid = 0
    for name, n in n_per.items():
        seq = txs[name]
        for _ in range(n):
            pos = int(RNG.integers(0, len(seq) - read_len + 1))
            frag = seq[pos : pos + read_len]
            # find ALL perfect-match alignments across transcripts (fwd only)
            hits = []
            for tname, tseq in txs.items():
                start = 0
                while True:
                    p = tseq.find(frag, start)
                    if p < 0:
                        break
                    hits.append((tname, p))
                    start = p + 1
            assert hits
            qname = f"r{rid}"
            rid += 1
            first = True
            for tname, p in hits:
                flag = 0 if first else 256
                sam_lines.append(
                    f"{qname}\t{flag}\t{tname}\t{p+1}\t255\t{read_len}M\t*\t0\t0\t"
                    f"{frag}\t{'I' * read_len}"
                )
                first = False
    # a couple of unalignable reads
    for k in range(3):
        seq = "".join(RNG.choice(list("ACGT"), read_len))
        sam_lines.append(f"un{k}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t{'I' * read_len}")
    return sam_lines


@pytest.fixture(scope="module")
def sam_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("em")
    txs = {"t1": T1, "t2": T2, "t3": T3}
    header = ["@HD\tVN:1.0\tSO:unknown"]
    for name, seq in txs.items():
        header.append(f"@SQ\tSN:{name}\tLN:{len(seq)}")
    lines = header + _make_reads({"t1": 60, "t2": 120, "t3": 60})
    p = d / "aln.sam"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def reference():
    return Reference(["t1", "t2", "t3"], [T1, T2, T3], [0, 0, 0])


def _run(sam_path, reference, model_type=1):
    names = [""] + ["t1", "t2", "t3"]
    bundle = parse_alignments(
        sam_path, names, read_type=model_type, has_polya=False, seed_len=25
    )
    spec = ModelSpec(model_type=model_type, seed_len=25, has_polya=False)
    model = GenerativeModel(spec, reference)
    model.estimate_from_stats(bundle.stats)
    res = run_em(model, reference, bundle, EMConfig())
    return bundle, res


def test_parse_alignments(sam_path, reference):
    bundle, _ = None, None
    names = [""] + ["t1", "t2", "t3"]
    bundle = parse_alignments(sam_path, names, 1, False, 25)
    assert bundle.cnt.N1 == 240
    assert bundle.cnt.N0 == 3
    assert bundle.cnt.N2 == 0
    assert bundle.hits.n_hits >= 240  # multireads from the shared prefix
    assert bundle.reads.n == 240
    # reads from the shared prefix must have hits on both t1 and t2
    multi = bundle.hits.n_isoform_multi_reads()
    assert multi > 0


def test_em_basic_invariants(sam_path, reference):
    bundle, res = _run(sam_path, reference)
    M = reference.M
    # expected counts: noise + transcripts == total alignable + N0
    assert res.counts.sum() == pytest.approx(bundle.cnt.N0 + bundle.cnt.N1, rel=1e-4)
    # TPM sums to 1e6
    assert res.tpm.sum() == pytest.approx(1e6, rel=1e-6)
    # t2 got twice t1's reads; length-normalized expression reflects that
    assert res.counts[2] > res.counts[1] > 0
    assert res.counts[3] == pytest.approx(60, rel=0.1)
    # posterior fracs per read sum to 1 (or 0 for impossible reads)
    frac_sum = np.zeros(bundle.reads.n)
    np.add.at(frac_sum, bundle.hits.rid, res.frac_hit)
    frac_sum += res.frac_noise
    ok = (np.abs(frac_sum - 1.0) < 1e-4) | (frac_sum == 0.0)
    assert ok.all()


def _python_em(bundle, model, reference, rounds=200):
    """Brute float64 EM with conprbs taken from the device kernel, to verify
    the segment-softmax E-step and M-step independently."""
    import jax.numpy as jnp

    from rsem_tpu.ops import (
        HitsDevice,
        KernelConfig,
        ReadsDevice,
        RefDevice,
        compute_log_conprb,
        compute_log_noise_conprb,
    )

    refd = RefDevice.from_reference(reference)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1])
    hd = HitsDevice.from_arrays(bundle.hits)
    dev = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in model.device_arrays().items()}
    lcp = np.asarray(compute_log_conprb(kcfg, refd, m1, None, hd, dev), dtype=np.float64)
    lnp_ = np.asarray(compute_log_noise_conprb(kcfg, m1, None, dev), dtype=np.float64)
    conprb = np.exp(lcp)
    ncp = np.exp(lnp_)

    N0, N1, N2, Ntot = bundle.cnt.N0, bundle.cnt.N1, bundle.cnt.N2, bundle.cnt.n_tot
    M = reference.M
    theta = np.empty(M + 1)
    theta[0] = max(N0 / (Ntot - N2), 1e-8)
    theta[1:] = (1 - theta[0]) / M
    offs = bundle.hits.read_offsets
    sid = bundle.hits.sid
    for _ in range(rounds):
        counts = np.zeros(M + 1)
        for i in range(N1):
            s, e = offs[i], offs[i + 1]
            w = theta[sid[s:e]] * conprb[s:e]
            w0 = theta[0] * ncp[i]
            tot = w.sum() + w0
            if tot < 1e-300:
                continue
            counts[0] += w0 / tot
            np.add.at(counts, sid[s:e], w / tot)
        counts[0] += N0
        theta = counts / counts.sum()
    return theta, counts


def test_em_matches_python_reference(sam_path, reference):
    """Device EM (model updates off) == float64 python EM on same conprbs."""
    names = [""] + ["t1", "t2", "t3"]
    bundle = parse_alignments(sam_path, names, 1, False, 25)
    spec = ModelSpec(model_type=1, seed_len=25, has_polya=False)
    model = GenerativeModel(spec, reference)
    model.estimate_from_stats(bundle.stats)

    cfg = EMConfig(update_model_rounds=0, min_round=200, max_round=200)
    res = run_em(model, reference, bundle, cfg)

    model2 = GenerativeModel(spec, reference)
    model2.estimate_from_stats(bundle.stats)
    theta_py, counts_py = _python_em(bundle, model2, reference, rounds=200)

    np.testing.assert_allclose(res.counts, counts_py, rtol=2e-3, atol=1e-3)


def test_single_no_qual_model_type0(sam_path, reference):
    bundle, res = _run(sam_path, reference, model_type=0)
    assert res.tpm.sum() == pytest.approx(1e6, rel=1e-6)
    assert res.counts[3] == pytest.approx(60, rel=0.1)
