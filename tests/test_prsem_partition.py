"""pRSEM partition models (all 15), ChIP-seq leg (tagAlign, fragment
length, peak calling, reproducibility), and the signal-feature pipeline."""

import gzip

import numpy as np
import pytest

from rsem_tpu.prsem.chipseq import (
    call_peaks,
    estimate_fragment_length,
    reproducible_peaks,
    write_peaks,
)
from rsem_tpu.prsem.partition import (
    PARTITION_MODELS,
    TranscriptFeatures,
    breaks_for_new_data,
    cap_stacked_reads,
    compute_partition,
    count_region_signal,
    count_tss_reads_within,
    cut_codes,
    logit_fit,
    logit_predict,
    r_cut_breaks,
    read_tagalign,
    region_peak_flags,
)


# --------------------------------------------------------------------- #
# regression/cut helpers                                                 #
# --------------------------------------------------------------------- #
class TestCut:
    def test_r_cut_matches_r_semantics(self):
        # R: cut(1:10, 3) -> (0.991,4] (4,7] (7,10]
        x = np.arange(1.0, 11.0)
        br = r_cut_breaks(x, 3)
        codes = cut_codes(x, br)
        assert codes.tolist() == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]

    def test_new_data_breaks_widen_bounds(self):
        br = r_cut_breaks(np.arange(1.0, 11.0), 3)
        x_new = np.array([-5.0, 5.0, 20.0])
        nb = breaks_for_new_data(br, x_new)
        codes = cut_codes(x_new, nb)
        assert codes[0] == 0 and codes[-1] == 2

    def test_logit_recovers_separation(self):
        rng = np.random.RandomState(0)
        x = rng.uniform(-2, 2, 400)
        y = (x + 0.1 * rng.randn(400) > 0).astype(float)
        X = np.column_stack([np.ones_like(x), x])
        beta = logit_fit(X, y)
        p = logit_predict(X, beta)
        assert ((p > 0.5) == (y > 0.5)).mean() > 0.95


# --------------------------------------------------------------------- #
# ChIP-seq signal features                                               #
# --------------------------------------------------------------------- #
def _write_tagalign(path, rows):
    with gzip.open(path, "wt") as f:
        for ch, s, e, st in rows:
            f.write(f"{ch}\t{s}\t{e}\tN\t1000\t{st}\n")


class TestSignals:
    def test_read_tagalign_and_cap(self, tmp_path):
        p = str(tmp_path / "t.tagAlign.gz")
        rows = [("chr1", 100, 150, "+")] * 8 + [("chr1", 500, 550, "-")]
        _write_tagalign(p, rows)
        reads = read_tagalign(p)
        assert len(reads["chr1"][0]) == 9
        capped = cap_stacked_reads(reads, 5)
        assert len(capped["chr1"][0]) == 6  # 5 stacked + 1 unique

    def test_count_region_signal_midpoint_rule(self):
        # one + read at 0-based [100,150); fraglen 100 -> fragment
        # [101,200] 1-based, midpoint 150.5
        reads = {"chr1": (np.array([100]), np.array([150]), np.array([0]))}
        regions = [("chr1", 120, 180), ("chr1", 210, 260), ("chr1", 1, 50)]
        sig = count_region_signal(regions, reads, fraglen=100)
        # overlap clipped to [120,180] = 61 bases over width 61
        assert sig[0] == pytest.approx(1.0)
        assert sig[1] == 0.0 and sig[2] == 0.0  # midpoint outside

    def test_count_tss_reads_within(self):
        reads = {"chr1": (np.array([100, 300]), np.array([150, 350]),
                          np.array([0, 0]))}
        regions = [("chr1", 90, 200), ("chr1", 140, 400)]
        nrd, n_tot = count_tss_reads_within(regions, reads)
        assert n_tot == 2
        assert nrd.tolist() == [1, 1]

    def test_region_peak_flags(self):
        peaks = {"chr1": np.array([[100, 200]])}
        flags = region_peak_flags(
            [("chr1", 150, 300), ("chr1", 250, 300), ("chr2", 1, 9)], peaks
        )
        assert flags.tolist() == [1, 0, 0]


class TestChipSeq:
    def test_fragment_length_recovery(self):
        rng = np.random.RandomState(5)
        # fragments of length ~200: + read at 5' end, - read at 3' end
        centers = rng.randint(5000, 200000, 4000)
        fl, rl = 200, 50
        s_plus = centers - fl // 2
        s_minus = centers + fl // 2 - rl
        starts = np.concatenate([s_plus, s_minus])
        ends = starts + rl
        strands = np.concatenate([np.zeros(4000, int), np.ones(4000, int)])
        est = estimate_fragment_length(
            {"chr1": (starts, ends, strands)}, bin_size=5)
        assert abs(est - fl) <= 15

    def test_call_peaks_finds_enriched_region(self):
        rng = np.random.RandomState(6)
        # background reads uniform; an enriched site at ~50000
        bg = rng.randint(0, 100000, 2000)
        pk = rng.randint(49900, 50100, 400)
        starts = np.concatenate([bg, pk])
        ends = starts + 50
        strands = rng.randint(0, 2, len(starts))
        reads = {"chr1": (starts, ends, strands)}
        call = call_peaks(reads, fraglen=150)
        assert "chr1" in call.peaks
        ivs = call.peaks["chr1"]
        hit = ((ivs[:, 0] <= 50100) & (ivs[:, 1] >= 49900)).any()
        assert hit
        # peaks cover a tiny fraction of the chromosome
        assert ivs[:, 1].max() - ivs[:, 0].min() < 20000 or len(ivs) < 20

    def test_reproducible_peaks_intersection(self):
        pooled = {"chr1": np.array([[100, 200], [500, 600], [900, 950]])}
        rep1 = {"chr1": np.array([[120, 180], [510, 590]])}
        rep2 = {"chr1": np.array([[90, 130], [905, 940]])}
        out = reproducible_peaks(pooled, [rep1, rep2])
        assert out["chr1"].tolist() == [[100, 200]]

    def test_write_peaks_roundtrip(self, tmp_path):
        from rsem_tpu.prsem.features import read_peaks

        p = str(tmp_path / "pk.regionPeak.gz")
        write_peaks({"chr1": np.array([[101, 200]])}, p)
        back = read_peaks(p)
        assert back["chr1"].tolist() == [[101, 200]]


# --------------------------------------------------------------------- #
# partition models                                                       #
# --------------------------------------------------------------------- #
def _synthetic_features(M=120, seed=0):
    """Features where counts rise with tss signal and peak status."""
    rng = np.random.RandomState(seed)
    tss_pk = (rng.uniform(size=M) < 0.4).astype(np.int64)
    tss_sig = np.where(tss_pk, rng.uniform(5, 50, M), rng.uniform(0, 2, M))
    body_sig = tss_sig * rng.uniform(0.2, 0.5, M)
    tes_sig = tss_sig * rng.uniform(0.05, 0.2, M)
    counts = np.where(
        tss_pk, rng.uniform(50, 400, M), rng.uniform(0, 4, M)
    )
    counts[rng.uniform(size=M) < 0.1] = 0.0
    tpm = counts / counts.sum() * 1e6
    is_training = (rng.uniform(size=M) < 0.6).astype(np.int64)
    # ensure both classes present in training
    is_training[np.flatnonzero(tss_pk == 1)[:5]] = 1
    is_training[np.flatnonzero(tss_pk == 0)[:5]] = 1
    return TranscriptFeatures(
        trids=[f"t{i}" for i in range(M)],
        pme_count=counts,
        is_training=is_training,
        tss_pk=tss_pk,
        body_pk=(body_sig > 2).astype(np.int64),
        tes_pk=(tes_sig > 2).astype(np.int64),
        tss_sig=tss_sig,
        body_sig=body_sig,
        tes_sig=tes_sig,
        efflen=rng.uniform(500, 3000, M),
        gc_fraction=rng.uniform(0.3, 0.7, M),
        pme_tpm=tpm,
        target_log10_tss_sig={
            "target1": np.where(tss_sig > 0, np.log10(tss_sig), -4.0),
            "target2": np.where(body_sig > 0, np.log10(body_sig), -4.0),
        },
    )


EXPECTED_PARTS = {
    "pk": 2, "pk_lgtnopk": 3, "cmb_lgt": 2,
    "lm3": 3, "lm4": 4, "lm5": 5, "lm6": 6,
    "nopk_lm2pk": 3, "nopk_lm3pk": 4, "nopk_lm4pk": 5, "nopk_lm5pk": 6,
    "pk_lm2nopk": 3, "pk_lm3nopk": 4, "pk_lm4nopk": 5, "pk_lm5nopk": 6,
}


class TestPartitionModels:
    @pytest.mark.parametrize("model", PARTITION_MODELS)
    def test_partition_shapes_and_codes(self, model):
        feats = _synthetic_features()
        res = compute_partition(model, feats)
        assert res.n_parts == EXPECTED_PARTS[model]
        assert res.partition.shape == (120,)
        assert res.partition.min() >= 0
        assert res.partition.max() < res.n_parts
        assert res.trn_partition.shape == (int(feats.is_training.sum()),)
        # training codes match the all-transcript codes on the training set
        # for models partitioned by fixed attributes
        if model == "pk":
            trn = feats.is_training.astype(bool)
            assert (res.partition[trn] == res.trn_partition).all()

    @pytest.mark.parametrize("model", ["pk", "lm3", "nopk_lm2pk",
                                       "pk_lm2nopk", "pk_lgtnopk",
                                       "cmb_lgt"])
    def test_prior_orders_with_expression(self, model):
        """Fitted alphas should give expressed (peak/high-signal)
        transcripts a larger prior on this cleanly separated data."""
        from rsem_tpu.prsem.prior import fit_partitioned_dm

        feats = _synthetic_features()
        res = compute_partition(model, feats)
        trn = feats.is_training.astype(bool)
        alpha, _ = fit_partitioned_dm(
            feats.pme_count[trn], res.trn_partition, res.n_parts)
        prior = alpha[res.partition]
        hi = prior[feats.tss_pk == 1].mean()
        lo = prior[feats.tss_pk == 0].mean()
        assert hi > lo

    def test_peak_lm_offsubset_is_partition_zero(self):
        feats = _synthetic_features()
        res = compute_partition("nopk_lm2pk", feats)
        assert (res.partition[feats.tss_pk == 0] == 0).all()
        assert (res.partition[feats.tss_pk == 1] > 0).all()
        res2 = compute_partition("pk_lm2nopk", feats)
        assert (res2.partition[feats.tss_pk == 1] == 0).all()
        assert (res2.partition[feats.tss_pk == 0] > 0).all()

    def test_cmb_lgt_tracks_expression(self):
        feats = _synthetic_features()
        res = compute_partition("cmb_lgt", feats)
        is_expr = (feats.pme_count > 0) & (feats.pme_tpm >= 1.0)
        agree = (res.partition == is_expr.astype(int)).mean()
        assert agree > 0.8

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="unknown partition model"):
            compute_partition("lm7", _synthetic_features())
