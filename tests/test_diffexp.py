"""Differential expression subsystem: EBSeq-equivalent tests (median
normalization, pattern enumeration, 2-condition and multi-condition EB
mixture, ngvector, FDR control)."""

import os

import numpy as np
import pytest

from rsem_tpu.diffexp import (
    control_fdr,
    crit_fun,
    eb_multi_test,
    eb_test,
    generate_ngvector,
    get_patterns,
    median_norm,
    ng_vector_from_scores,
    run_ebseq,
    unmappability,
)


def _simulate_counts(rng, n_ee=60, n_de=20, reps=(4, 4), mean_lo=50,
                     mean_hi=400, fc=4.0, disp=0.1):
    """NB counts: n_ee equally-expressed rows + n_de rows with fold change."""
    n1, n2 = reps
    means = rng.uniform(mean_lo, mean_hi, size=n_ee + n_de)
    m1 = means.copy()
    m2 = means.copy()
    m2[n_ee:] = means[n_ee:] / fc
    r = 1.0 / disp

    def nb(mean, size):
        p = r / (r + mean)
        return rng.negative_binomial(r, p, size=size)

    X = np.zeros((n_ee + n_de, n1 + n2))
    for g in range(n_ee + n_de):
        X[g, :n1] = nb(m1[g], n1)
        X[g, n1:] = nb(m2[g], n2)
    return X


class TestCore:
    def test_median_norm(self):
        X = np.array([[10.0, 20.0], [100.0, 200.0], [4.0, 8.0]])
        s = median_norm(X)
        # every gene doubled in sample 2 -> sizes ratio 2, geometric center
        assert s[1] / s[0] == pytest.approx(2.0)

    def test_get_patterns_3cond(self):
        pats = get_patterns(3)
        assert pats.tolist() == [
            [1, 1, 1], [1, 1, 2], [1, 2, 1], [1, 2, 2], [1, 2, 3],
        ]

    def test_get_patterns_counts(self):
        # Bell numbers: 4 conditions -> 15 set partitions
        assert len(get_patterns(4)) == 15

    def test_crit_fun(self):
        ppee = np.array([0.01, 0.02, 0.5, 0.9])
        thr = crit_fun(ppee, 0.05)
        assert 0 < thr <= 1


class TestEBTest:
    def test_detects_de(self):
        rng = np.random.RandomState(0)
        X = _simulate_counts(rng)
        cond = np.array([0] * 4 + [1] * 4)
        res = eb_test(X, cond)
        ppde = res.ppde
        assert len(ppde) == 80
        # DE rows (last 20) should dominate the top of the ranking
        assert np.median(ppde[60:]) > 0.9
        assert np.median(ppde[:60]) < 0.5
        # fold changes point the right way (condition1 over condition2)
        assert np.median(res.post_fc[60:]) > 2.0
        assert np.median(res.real_fc[:60]) == pytest.approx(1.0, abs=0.3)
        # mixture weight roughly matches the 25% DE fraction
        assert 0.05 < res.p_mix < 0.6

    def test_all_zero_rows_dropped(self):
        rng = np.random.RandomState(1)
        X = _simulate_counts(rng, n_ee=30, n_de=10)
        X[5] = 0.0
        res = eb_test(X, np.array([0] * 4 + [1] * 4),
                      names=[f"g{i}" for i in range(40)])
        assert "g5" not in res.names
        assert len(res.names) == 39 and len(res.ppde) == 39

    def test_ng_groups(self):
        rng = np.random.RandomState(2)
        X = _simulate_counts(rng, n_ee=40, n_de=10)
        ng = rng.randint(1, 4, size=50)
        res = eb_test(X, np.array([0] * 4 + [1] * 4), ng_vector=ng)
        assert len(res.beta) == 3
        assert np.median(res.ppde[40:]) > 0.8


class TestEBMulti:
    def test_three_conditions(self):
        rng = np.random.RandomState(3)
        n_ee, n_de = 40, 15
        means = rng.uniform(100, 300, size=n_ee + n_de)
        r = 10.0
        X = np.zeros((n_ee + n_de, 9))
        for g in range(n_ee + n_de):
            m = [means[g]] * 3
            if g >= n_ee:
                m[2] = means[g] / 5  # condition 3 differs: pattern (1,1,2)
            for c in range(3):
                p = r / (r + m[c])
                X[g, c * 3:(c + 1) * 3] = rng.negative_binomial(r, p, size=3)
        cond = np.repeat([0, 1, 2], 3)
        res = eb_multi_test(X, cond)
        assert res.pp.shape == (n_ee + n_de, 5)
        sums = np.nansum(res.pp, axis=1)
        assert np.allclose(sums[~np.isnan(res.pp).any(axis=1)], 1.0,
                           atol=1e-6)
        # DE rows should prefer pattern 2 = (1,1,2)
        de_map = [res.map_pattern[i] for i in range(n_ee, n_ee + n_de)]
        assert sum(m == "Pattern2" for m in de_map) >= n_de * 0.6
        assert np.median(res.ppde[n_ee:]) > 0.9
        assert np.median(res.ppde[:n_ee]) < 0.5


class TestNgVector:
    def test_unmappability_shared_kmer(self):
        # t1 and t2 share their entire sequence -> all k-mers shared
        s = "ACGTACGTACGTACGT"
        u = "TTTTGGGGCCCCAAAA"
        scores = unmappability(["t1", "t2", "t3"], [s, s, u], k=8)
        assert scores[0] == pytest.approx(1.0)
        assert scores[1] == pytest.approx(1.0)
        assert scores[2] == pytest.approx(0.0)

    def test_short_transcript(self):
        scores = unmappability(["t1", "t2"], ["ACGT", "A" * 30], k=25)
        assert scores[0] == -1.0
        assert scores[1] == pytest.approx(0.0)
        ng = ng_vector_from_scores(scores)
        assert ng[0] == 3

    def test_repeat_within_one_transcript_not_counted(self):
        # k-mer repeated only within the same transcript: numerator ==
        # denominator -> not unmappable (calcClusteringInfo.cpp:126)
        s = "ACGTACGTAC"  # k=4: ACGT appears twice, all within t1
        scores = unmappability(["t1"], [s], k=4)
        assert scores[0] == pytest.approx(0.0)

    def test_generate_ngvector_files(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        (tmp_path / "tx.fa").write_text(
            ">t1\nACGTACGTACGTACGTACGT\n>t2\nACGTACGTACGTACGTACGT\n"
            ">t3\nTTTTGGGGCCCCAAAATTTTGGGG\n>t4\nACGT\n"
        )
        ng = generate_ngvector("tx.fa", "out", k=8, quiet=True)
        assert os.path.exists("out.ump") and os.path.exists("out.ngvec")
        assert ng[3] == 3  # too short
        assert ng[0] == ng[1]  # identical transcripts cluster together
        assert ng[0] > ng[2]  # more unmappable -> higher group


class TestRunner:
    def _matrix(self, tmp_path, X, names=None):
        names = names or [f"g{i}" for i in range(len(X))]
        path = str(tmp_path / "mat.txt")
        with open(path, "w") as f:
            cols = "\t".join(f'"s{j}"' for j in range(X.shape[1]))
            f.write("\t" + cols + "\n")
            for n, row in zip(names, X):
                f.write(f'"{n}"\t' + "\t".join(f"{v:.2f}" for v in row)
                        + "\n")
        return path

    def test_run_ebseq_two_cond_and_fdr(self, tmp_path):
        rng = np.random.RandomState(4)
        X = _simulate_counts(rng, n_ee=40, n_de=15)
        mat = self._matrix(tmp_path, X)
        out = str(tmp_path / "res.txt")
        run_ebseq(mat, [4, 4], out)
        lines = open(out).read().splitlines()
        assert lines[0].split("\t") == [
            '"PPEE"', '"PPDE"', '"PostFC"', '"RealFC"', '"C1Mean"',
            '"C2Mean"',
        ]
        # sorted descending by PPDE
        ppde = [float(l.split("\t")[2]) for l in lines[1:]]
        assert ppde == sorted(ppde, reverse=True)
        assert os.path.exists(out + ".normalized_data_matrix")

        sel = str(tmp_path / "sel.txt")
        n_hard = control_fdr(out, 0.05, sel, log=lambda *_: None)
        kept = open(sel).read().splitlines()
        assert len(kept) == n_hard + 1
        for line in kept[1:]:
            assert 1.0 - float(line.split("\t")[2]) <= 0.05
        n_soft = control_fdr(out, 0.05, str(tmp_path / "soft.txt"),
                             soft=True, log=lambda *_: None)
        assert n_soft >= n_hard

    def test_run_ebseq_multi(self, tmp_path):
        rng = np.random.RandomState(5)
        n = 30
        X = rng.poisson(100, size=(n, 9)).astype(float)
        X[20:, 6:] *= 6  # condition 3 up for last 10 rows
        mat = self._matrix(tmp_path, X)
        out = str(tmp_path / "multi.txt")
        run_ebseq(mat, [3, 3, 3], out)
        lines = open(out).read().splitlines()
        hdr = lines[0].split("\t")
        assert hdr[:5] == ['"Pattern1"', '"Pattern2"', '"Pattern3"',
                           '"Pattern4"', '"Pattern5"']
        assert hdr[5] == '"MAP"' and hdr[6] == '"PPDE"'
        assert os.path.exists(out + ".pattern")
        assert os.path.exists(out + ".condmeans")
        pat = open(out + ".pattern").read().splitlines()
        assert pat[1].split("\t") == ['"Pattern1"', "1", "1", "1"]
