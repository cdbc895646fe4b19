"""Training-set selection (pRSEM/Prsem.py buildTrainingSet +
process-rnaseq.R selTrainingTr).

A transcript enters the training set when:
  1. its gene has exactly one isoform and spans >= min_gene_len
     (Prsem.py:61-71, TRAINING_GENE_MIN_LEN=1003);
  2. TSS/body/TES mappability all exceed min_mpp (selTrainingTr, R:570-574);
  3. it is not nested within another transcript's span, strand-blind
     (R:576-579);
  4. its exons are not all contained in other transcripts' exons (R:581-585);
  5. no other transcript's TSS falls in its [tss-w, tss+w] window
     (R:587-597).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .coords import Mappability, TrCoord, fill_mappability

TRAINING_GENE_MIN_LEN = 1003  # pRSEM/Param.py:13
TRAINING_MIN_MAPPABILITY = 0.8  # pRSEM/Param.py:14
FLANKING_WIDTH = 500  # pRSEM/Param.py:15


def _single_isoform_candidates(coords: List[TrCoord],
                               min_gene_len: int) -> List[int]:
    by_gene: Dict[str, List[int]] = {}
    for i, c in enumerate(coords):
        by_gene.setdefault(c.gene_id, []).append(i)
    out = []
    for _, idxs in by_gene.items():
        if len(idxs) != 1:
            continue
        c = coords[idxs[0]]
        if c.end - c.start + 1 >= min_gene_len:
            out.append(idxs[0])
    return sorted(out)


def _nested_within_other(coords: List[TrCoord], cand: List[int]) -> set:
    """Candidate indices whose [start,end] lies within another transcript's
    span on the same chromosome (strand ignored, self excluded)."""
    by_chrom: Dict[str, List[int]] = {}
    for i, c in enumerate(coords):
        by_chrom.setdefault(c.chrom, []).append(i)
    nested = set()
    for i in cand:
        c = coords[i]
        for j in by_chrom.get(c.chrom, ()):
            if j == i or coords[j].trid == c.trid:
                continue
            o = coords[j]
            if o.start <= c.start and c.end <= o.end:
                nested.add(i)
                break
    return nested


def _exons_all_covered(coords: List[TrCoord], cand: List[int]) -> set:
    """Candidate indices where every exon is contained in some other
    transcript's exon (strand ignored)."""
    by_chrom: Dict[str, List[int]] = {}
    for i, c in enumerate(coords):
        by_chrom.setdefault(c.chrom, []).append(i)
    covered = set()
    for i in cand:
        c = coords[i]
        others = [j for j in by_chrom.get(c.chrom, ())
                  if j != i and coords[j].trid != c.trid]
        n_cov = 0
        for (es, ee) in c.exons:
            hit = False
            for j in others:
                for (os_, oe) in coords[j].exons:
                    if os_ <= es and ee <= oe:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                n_cov += 1
        if c.exons and n_cov == len(c.exons):
            covered.add(i)
    return covered


def _tss_region_conflicts(coords: List[TrCoord], cand: List[int],
                          flanking_width: int) -> set:
    """Candidate indices whose TSS window contains another transcript's TSS."""
    by_chrom: Dict[str, List[int]] = {}
    for i, c in enumerate(coords):
        by_chrom.setdefault(c.chrom, []).append(i)
    # per chromosome: TSS positions sorted, with the owning index alongside
    tss_sorted: Dict[str, tuple] = {}
    for ch, idxs in by_chrom.items():
        pos = np.array([coords[j].tss for j in idxs], dtype=np.int64)
        order = np.argsort(pos, kind="stable")
        tss_sorted[ch] = (pos[order], [idxs[k] for k in order])
    bad = set()
    for i in cand:
        c = coords[i]
        pos, owners = tss_sorted[c.chrom]
        lo = int(np.searchsorted(pos, c.tss - flanking_width, side="left"))
        hi = int(np.searchsorted(pos, c.tss + flanking_width, side="right"))
        for k in range(lo, hi):
            if coords[owners[k]].trid != c.trid:
                bad.add(i)
                break
    return bad


def select_training_set(
    coords: List[TrCoord],
    mappability: Mappability,
    min_gene_len: int = TRAINING_GENE_MIN_LEN,
    min_mpp: float = TRAINING_MIN_MAPPABILITY,
    flanking_width: int = FLANKING_WIDTH,
) -> List[int]:
    """Returns sorted indices (into coords) of training transcripts; fills
    tss/body/tes mappability on the single-isoform candidates as a side
    effect (NaN elsewhere, as in Prsem.py's all_tr_crd)."""
    cand = _single_isoform_candidates(coords, min_gene_len)
    fill_mappability([coords[i] for i in cand], mappability, flanking_width)
    cand = [
        i for i in cand
        if coords[i].tss_mpp > min_mpp
        and coords[i].body_mpp > min_mpp
        and coords[i].tes_mpp > min_mpp
    ]
    nested = _nested_within_other(coords, cand)
    cand = [i for i in cand if i not in nested]
    covered = _exons_all_covered(coords, cand)
    cand = [i for i in cand if i not in covered]
    conflicts = _tss_region_conflicts(coords, cand, flanking_width)
    return [i for i in cand if i not in conflicts]
