"""Ground-truth validation of the ChIP-seq leg's SPP/IDR-equivalent contract.

The reference pipeline calls peaks with the vendored SPP
(pRSEM/phantompeakqualtools) and filters with IDR (pRSEM/idrCode) — both R,
unavailable here. What feeds pRSEM downstream is only (a) the estimated
fragment length and (b) the TSS-peak partition of transcripts
(prsem-calculate-expression:29-55 -> genPriorByTSSPeak). These tests pin
that contract against PLANTED GROUND TRUTH instead of an R golden run:
reads are simulated with a known fragment length from known peak regions,
and the native leg (prsem/chipseq.py) must recover the fragment length
within +-20bp and produce a TSS-flag partition that matches the truth on
>= 95% of transcripts, with the IDR-substitute reproducibility filter
suppressing replicate-inconsistent peaks.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from rsem_tpu.prsem.chipseq import (
    call_peaks,
    estimate_fragment_length,
    reproducible_peaks,
)
from rsem_tpu.prsem.features import tss_peak_flags

CHROM_LEN = 400_000
FRAGLEN = 180
READ_LEN = 36
PEAKS = [(20_000, 20_400), (55_000, 55_300), (120_500, 121_000),
         (200_000, 200_600), (310_000, 310_350)]


def _simulate_reads(rng, n_background, per_peak, jitter=0.0):
    """Fragment 5' ends; each fragment contributes a +strand read at its
    left end and implies a -strand read at the right end (SPP's model)."""
    starts, ends, strands = [], [], []

    def add_fragment(center):
        frag_start = int(center - FRAGLEN // 2)
        if rng.random() < 0.5:
            s = frag_start
            starts.append(s); ends.append(s + READ_LEN); strands.append(0)
        else:
            e = frag_start + FRAGLEN
            starts.append(e - READ_LEN); ends.append(e); strands.append(1)

    for _ in range(n_background):
        add_fragment(rng.integers(FRAGLEN, CHROM_LEN - FRAGLEN))
    for (lo, hi) in PEAKS:
        for _ in range(per_peak):
            c = rng.integers(lo, hi) + int(rng.normal(0, 1 + 40 * jitter))
            add_fragment(np.clip(c, FRAGLEN, CHROM_LEN - FRAGLEN))
    s = np.asarray(starts, dtype=np.int64)
    e = np.asarray(ends, dtype=np.int64)
    st = np.asarray(strands, dtype=np.int8)
    return {"chr1": (s, e, st)}


def test_fragment_length_recovery():
    rng = np.random.default_rng(0)
    reads = _simulate_reads(rng, n_background=4000, per_peak=1500)
    est = estimate_fragment_length(reads)
    assert abs(est - FRAGLEN) <= 20, est


def test_peak_calls_recover_planted_peaks():
    rng = np.random.default_rng(1)
    target = _simulate_reads(rng, n_background=6000, per_peak=1200)
    control = _simulate_reads(rng, n_background=12000, per_peak=0)
    pc = call_peaks(target, control)
    assert abs(pc.fraglen - FRAGLEN) <= 20
    called = pc.peaks.get("chr1")
    assert called is not None and len(called)
    # every planted peak is recovered
    for (lo, hi) in PEAKS:
        hit = ((called[:, 0] <= hi) & (called[:, 1] >= lo)).any()
        assert hit, (lo, hi, called)
    # the calls don't blanket the chromosome: total called base pairs stay
    # within a few x of the planted enrichment footprint
    called_bp = int((called[:, 1] - called[:, 0] + 1).sum())
    planted_bp = sum(hi - lo for lo, hi in PEAKS) + len(PEAKS) * 2 * FRAGLEN
    assert called_bp < 4 * planted_bp, (called_bp, planted_bp)


def test_tss_partition_matches_ground_truth():
    """The pk partition derived from native peaks agrees with the one
    derived from the PLANTED peak set (the quantity SPP+IDR feed pRSEM)."""
    rng = np.random.default_rng(2)
    target = _simulate_reads(rng, n_background=6000, per_peak=1200)
    control = _simulate_reads(rng, n_background=12000, per_peak=0)
    pc = call_peaks(target, control)

    # transcripts: TSS at planted peak centers (truth flag 1) and far away
    # (truth flag 0)
    coords, truth = [], []
    for (lo, hi) in PEAKS:
        coords.append(SimpleNamespace(chrom="chr1", tss=(lo + hi) // 2))
        truth.append(1)
    for tss in range(5_000, CHROM_LEN, 9_000):
        if all(abs(tss - (lo + hi) // 2) > 3_000 for lo, hi in PEAKS):
            coords.append(SimpleNamespace(chrom="chr1", tss=tss))
            truth.append(0)
    truth = np.asarray(truth)
    flags = tss_peak_flags(coords, pc.peaks)
    agreement = float((flags == truth).mean())
    assert agreement >= 0.95, agreement


def test_reproducibility_filter_drops_nonreplicated():
    """IDR substitute: pooled peaks must be supported by every replicate."""
    rng = np.random.default_rng(3)
    t1 = _simulate_reads(rng, n_background=5000, per_peak=900)
    t2 = _simulate_reads(rng, n_background=5000, per_peak=900)
    pooled = {"chr1": (np.concatenate([t1["chr1"][0], t2["chr1"][0]]),
                       np.concatenate([t1["chr1"][1], t2["chr1"][1]]),
                       np.concatenate([t1["chr1"][2], t2["chr1"][2]]))}
    control = _simulate_reads(rng, n_background=10000, per_peak=0)
    pc_pool = call_peaks(pooled, control, fraglen=FRAGLEN)
    pc1 = call_peaks(t1, control, fraglen=FRAGLEN)
    pc2 = call_peaks(t2, control, fraglen=FRAGLEN)
    # replicate 2 with one planted peak's support removed entirely
    fake = {"chr1": pc2.peaks["chr1"][
        ~((pc2.peaks["chr1"][:, 0] <= PEAKS[0][1])
          & (pc2.peaks["chr1"][:, 1] >= PEAKS[0][0]))]}
    rep = reproducible_peaks(pc_pool.peaks, [pc1.peaks, fake])
    kept = rep.get("chr1", np.zeros((0, 2), dtype=np.int64))
    # the dropped peak is filtered out; the others survive
    assert not ((kept[:, 0] <= PEAKS[0][1]) & (kept[:, 1] >= PEAKS[0][0])).any()
    for (lo, hi) in PEAKS[1:]:
        assert ((kept[:, 0] <= hi) & (kept[:, 1] >= lo)).any(), (lo, hi)
