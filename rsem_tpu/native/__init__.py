"""Native (C++) runtime components.

The compute path is JAX/XLA on TPU; host-side scatter-heavy bookkeeping (the
model sufficient statistics of the first EM rounds) runs in a multithreaded
C++ sidecar because tiny-table random scatter is CPU-cache-resident work.
The library is built on demand with g++; if no toolchain is available the
callers fall back to the (slower) pure-JAX path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libsuffstats.so")
_SRC = os.path.join(_DIR, "suffstats.cpp")

_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.suffstats.restype = None
    if hasattr(lib, "conprb"):
        lib.conprb.restype = None
    if hasattr(lib, "em_count_step"):
        lib.em_count_step.restype = None
    _lib = lib
    return _lib


def _ptr(arr: Optional[np.ndarray], ctype):
    if arr is None:
        return ctypes.POINTER(ctype)()
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _model_tables(model, reads):
    """Shared array prep for the native kernels."""
    spec = model.spec
    paired = spec.paired
    if paired:
        m1, m2 = reads.mate1, reads.mate2
    else:
        m1, m2 = reads, None
    max_len = m1.max_len if not paired else max(m1.max_len, m2.max_len)

    def padded(ra):
        if ra is None:
            return None, None
        codes = np.ascontiguousarray(
            np.pad(ra.codes, ((0, 0), (0, max_len - ra.codes.shape[1])))
        )
        quals = None
        if spec.has_qual:
            quals = np.ascontiguousarray(
                np.pad(ra.quals, ((0, 0), (0, max_len - ra.quals.shape[1])))
            )
        return codes, quals

    codes1, quals1 = padded(m1)
    codes2, quals2 = padded(m2)
    glb, gub = model.gld_window
    if model.mld is not None:
        mlb, mub = model.mld_window
        mpdf, mcdf = model.mld.device_arrays(mlb, mub)
    else:
        mlb, mub = 0, 1
        mpdf = mcdf = np.zeros(2)
    gpdf, gcdf = model.gld.device_arrays(glb, gub)
    return dict(
        m1=m1, m2=m2, max_len=max_len,
        codes1=codes1, quals1=quals1, codes2=codes2, quals2=quals2,
        glb=glb, gub=gub, mlb=mlb, mub=mub,
        gpdf=np.ascontiguousarray(gpdf), gcdf=np.ascontiguousarray(gcdf),
        mpdf=np.ascontiguousarray(mpdf), mcdf=np.ascontiguousarray(mcdf),
        rspd_pdf=np.ascontiguousarray(model.rspd.pdf),
        rspd_cdf=np.ascontiguousarray(model.rspd.cdf),
        pro_len=100 if spec.has_qual else model.pro.pro_len,
    )


def native_conprb(hits, reads, ref, model, n_threads: Optional[int] = None):
    """Exact float64 per-hit conprb + noise conprb (reference: getConPrb /
    getNoiseConPrb). Returns (conprb [H] f64, ncp [N] f64) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "conprb"):
        return None
    spec = model.spec
    t = _model_tables(model, reads)
    m1, m2 = t["m1"], t["m2"]
    paired = spec.paired

    lq = np.ascontiguousarray(
        (reads.lq if paired else m1.lq).astype(np.uint8)
    )
    pro = np.ascontiguousarray(model.pro.p.reshape(-1))
    npro = np.ascontiguousarray(model.npro.p.reshape(-1))
    mw = np.ascontiguousarray(model.mw)
    out_conprb = np.zeros(hits.n_hits)
    out_ncp = np.zeros(m1.n)

    rid = np.ascontiguousarray(hits.rid, dtype=np.int32)
    sid = np.ascontiguousarray(hits.sid, dtype=np.int32)
    dirs = np.ascontiguousarray(hits.dir, dtype=np.int8)
    pos = np.ascontiguousarray(hits.pos, dtype=np.int32)
    ins = np.ascontiguousarray(hits.insert_len, dtype=np.int32) if paired else None
    lens1 = np.ascontiguousarray(m1.lens, dtype=np.int32)
    lens2 = np.ascontiguousarray(m2.lens, dtype=np.int32) if paired else None
    ref_codes = np.ascontiguousarray(ref.codes, dtype=np.uint8)
    ref_offsets = np.ascontiguousarray(ref.offsets, dtype=np.int64)
    tot_len = np.ascontiguousarray(ref.tot_len, dtype=np.int32)
    full_len = np.ascontiguousarray(ref.full_len, dtype=np.int32)
    mask_start = np.ascontiguousarray(ref.mask_start, dtype=np.int32)

    nt = n_threads or min(os.cpu_count() or 1, 16)
    c = ctypes
    lib.conprb(
        c.c_int64(hits.n_hits),
        _ptr(rid, c.c_int32), _ptr(sid, c.c_int32), _ptr(dirs, c.c_int8),
        _ptr(pos, c.c_int32), _ptr(ins, c.c_int32),
        _ptr(t["codes1"], c.c_uint8), _ptr(t["quals1"], c.c_uint8),
        _ptr(lens1, c.c_int32),
        _ptr(t["codes2"], c.c_uint8), _ptr(t["quals2"], c.c_uint8),
        _ptr(lens2, c.c_int32),
        c.c_int64(m1.n), c.c_int64(t["max_len"]), _ptr(lq, c.c_uint8),
        _ptr(ref_codes, c.c_uint8), _ptr(ref_offsets, c.c_int64),
        _ptr(tot_len, c.c_int32), _ptr(full_len, c.c_int32),
        _ptr(mask_start, c.c_int32),
        c.c_int(int(spec.has_qual)), c.c_int(int(paired)),
        c.c_int(int(spec.est_rspd)), c.c_int(spec.B), c.c_double(spec.probF),
        c.c_int(t["pro_len"]), c.c_int(spec.seed_len),
        c.c_int(t["glb"]), c.c_int(t["gub"]), c.c_int(t["mlb"]),
        c.c_int(t["mub"]), c.c_int(int(spec.use_mld_single)),
        _ptr(t["gpdf"], c.c_double), _ptr(t["gcdf"], c.c_double),
        _ptr(t["mpdf"], c.c_double), _ptr(t["mcdf"], c.c_double),
        _ptr(t["rspd_pdf"], c.c_double), _ptr(t["rspd_cdf"], c.c_double),
        _ptr(pro, c.c_double), _ptr(npro, c.c_double), _ptr(mw, c.c_double),
        c.c_int(nt),
        _ptr(out_conprb, c.c_double), _ptr(out_ncp, c.c_double),
    )
    return out_conprb, out_ncp


def native_em_count_step(hits, conprb, ncp, theta, M, n_threads=None):
    """One cached-conprb E-step on the host (fracs + expected counts)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "em_count_step"):
        return None
    offsets = np.ascontiguousarray(hits.read_offsets, dtype=np.int64)
    sid = np.ascontiguousarray(hits.sid, dtype=np.int32)
    conprb = np.ascontiguousarray(conprb)
    ncp = np.ascontiguousarray(ncp)
    theta = np.ascontiguousarray(theta)
    out_frac = np.zeros(hits.n_hits)
    out_frac_noise = np.zeros(hits.n_reads)
    out_counts = np.zeros(M + 1)
    nt = n_threads or min(os.cpu_count() or 1, 16)
    c = ctypes
    lib.em_count_step(
        c.c_int64(hits.n_reads), _ptr(offsets, c.c_int64), _ptr(sid, c.c_int32),
        _ptr(conprb, c.c_double), _ptr(ncp, c.c_double),
        _ptr(theta, c.c_double), c.c_int64(M), c.c_int(nt),
        _ptr(out_frac, c.c_double), _ptr(out_frac_noise, c.c_double),
        _ptr(out_counts, c.c_double),
    )
    return out_frac, out_frac_noise, out_counts


def native_suffstats(
    hits,  # io.HitArrays
    frac_hit: np.ndarray,
    frac_noise: np.ndarray,
    reads,  # ReadArrays or PairedReadArrays
    ref,  # refprep.Reference
    model,  # GenerativeModel
    n_threads: Optional[int] = None,
):
    """Returns the suff dict consumed by GenerativeModel.finish_round, or
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    spec = model.spec
    paired = spec.paired
    if paired:
        m1, m2 = reads.mate1, reads.mate2
    else:
        m1, m2 = reads, None
    max_len = m1.max_len if not paired else max(m1.max_len, m2.max_len)

    def padded(ra):
        if ra is None:
            return None, None
        codes = np.ascontiguousarray(
            np.pad(ra.codes, ((0, 0), (0, max_len - ra.codes.shape[1])))
        )
        quals = None
        if spec.has_qual:
            quals = np.ascontiguousarray(
                np.pad(ra.quals, ((0, 0), (0, max_len - ra.quals.shape[1])))
            )
        return codes, quals

    codes1, quals1 = padded(m1)
    codes2, quals2 = padded(m2)

    glb, gub = model.gld_window
    if model.mld is not None:
        mlb, mub = model.mld_window
        mpdf, mcdf = model.mld.device_arrays(mlb, mub)
    else:
        mlb, mub = 0, 1
        mpdf = mcdf = np.zeros(2)
    gpdf, gcdf = model.gld.device_arrays(glb, gub)

    pro_len = 100 if spec.has_qual else model.pro.pro_len
    out_pro = np.zeros(pro_len * 25)
    out_npro = np.zeros(500 if spec.has_qual else 5)
    out_gld = np.zeros(gub - glb)
    out_rspd = np.zeros(spec.B)

    frac_hit = np.ascontiguousarray(frac_hit, dtype=np.float32)
    frac_noise = np.ascontiguousarray(frac_noise, dtype=np.float32)
    rid = np.ascontiguousarray(hits.rid, dtype=np.int32)
    sid = np.ascontiguousarray(hits.sid, dtype=np.int32)
    dirs = np.ascontiguousarray(hits.dir, dtype=np.int8)
    pos = np.ascontiguousarray(hits.pos, dtype=np.int32)
    ins = (
        np.ascontiguousarray(hits.insert_len, dtype=np.int32) if paired else None
    )
    lens1 = np.ascontiguousarray(m1.lens, dtype=np.int32)
    lens2 = np.ascontiguousarray(m2.lens, dtype=np.int32) if paired else None
    ref_codes = np.ascontiguousarray(ref.codes, dtype=np.uint8)
    ref_offsets = np.ascontiguousarray(ref.offsets, dtype=np.int64)
    tot_len = np.ascontiguousarray(ref.tot_len, dtype=np.int32)
    full_len = np.ascontiguousarray(ref.full_len, dtype=np.int32)
    gpdf = np.ascontiguousarray(gpdf)
    gcdf = np.ascontiguousarray(gcdf)
    mpdf = np.ascontiguousarray(mpdf)
    mcdf = np.ascontiguousarray(mcdf)
    rspd_pdf = np.ascontiguousarray(model.rspd.pdf)
    rspd_cdf = np.ascontiguousarray(model.rspd.cdf)

    nt = n_threads or min(os.cpu_count() or 1, 16)
    c = ctypes
    lib.suffstats(
        c.c_int64(hits.n_hits),
        _ptr(rid, c.c_int32), _ptr(sid, c.c_int32), _ptr(dirs, c.c_int8),
        _ptr(pos, c.c_int32), _ptr(ins, c.c_int32),
        _ptr(frac_hit, c.c_float),
        _ptr(codes1, c.c_uint8), _ptr(quals1, c.c_uint8), _ptr(lens1, c.c_int32),
        _ptr(codes2, c.c_uint8), _ptr(quals2, c.c_uint8), _ptr(lens2, c.c_int32),
        c.c_int64(m1.n), c.c_int64(max_len),
        _ptr(frac_noise, c.c_float),
        _ptr(ref_codes, c.c_uint8), _ptr(ref_offsets, c.c_int64),
        _ptr(tot_len, c.c_int32), _ptr(full_len, c.c_int32),
        c.c_int(int(spec.has_qual)), c.c_int(int(paired)),
        c.c_int(int(spec.est_rspd)), c.c_int(spec.B), c.c_double(spec.probF),
        c.c_int(pro_len), c.c_int(glb), c.c_int(gub), c.c_int(mlb), c.c_int(mub),
        c.c_int(int(spec.use_mld_single)),
        _ptr(gpdf, c.c_double), _ptr(gcdf, c.c_double),
        _ptr(mpdf, c.c_double), _ptr(mcdf, c.c_double),
        _ptr(rspd_pdf, c.c_double), _ptr(rspd_cdf, c.c_double),
        c.c_int(nt),
        _ptr(out_pro, c.c_double), _ptr(out_npro, c.c_double),
        _ptr(out_gld, c.c_double), _ptr(out_rspd, c.c_double),
    )

    suff = {
        "pro": out_pro.reshape(pro_len, 5, 5),
        "npro": out_npro.reshape(100, 5) if spec.has_qual else out_npro,
    }
    if paired:
        suff["gld"] = out_gld
    if spec.est_rspd:
        suff["rspd"] = out_rspd
    return suff
