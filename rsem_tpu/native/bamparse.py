"""ctypes bindings for the native BAM ingestion sidecar (bamparse.cpp).

The sidecar replaces the per-record Python BAM decode loop
(rsem_tpu/io/sam.py BamReader + parse_alignments grouping) — the reference
streams records through htslib in parseIt.cpp:90-152. Python keeps reading
the BAM header (cheap) and builds the final numpy containers; the hot
record loop and BGZF inflation run in C++.

Returns flat arrays; rsem_tpu.io.sam assembles ReadArrays/HitArrays/stats
from them so results are byte-identical to the pure-Python path (tested in
tests/test_native_ingest.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libbamparse.so")
_SRC = os.path.join(_DIR, "bamparse.cpp")

_lib = None
_tried = False

_c_u8p = ctypes.POINTER(ctypes.c_uint8)
_c_i32p = ctypes.POINTER(ctypes.c_int32)
_c_i64p = ctypes.POINTER(ctypes.c_int64)


def _build() -> bool:
    base = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _SO,
    ]
    # prefer libdeflate for BGZF block inflate (~2-3x zlib); fall back to
    # zlib-only when the dev header/library is unavailable
    candidates = [
        base + ["-DUSE_LIBDEFLATE", "-ldeflate", "-lz"],
        base + ["-lz"],
    ]
    for cmd in candidates:
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
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
    lib.bamparse_run.restype = ctypes.c_void_p
    lib.bamparse_run.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        _c_i32p, _c_i64p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.bamparse_sizes.restype = None
    lib.bamparse_sizes.argtypes = [ctypes.c_void_p, _c_i64p]
    lib.bamparse_export_n1.restype = None
    lib.bamparse_export_n1.argtypes = [ctypes.c_void_p] + [_c_u8p, _c_u8p,
        _c_i32p, _c_u8p, _c_u8p, _c_i32p, _c_i32p, _c_i32p, _c_i32p, _c_i32p]
    lib.bamparse_export_cat.restype = None
    lib.bamparse_export_cat.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        _c_u8p, _c_u8p, _c_i32p, _c_u8p, _c_u8p, _c_i32p,
    ]
    lib.bamparse_export_lq.restype = None
    lib.bamparse_export_lq.argtypes = [ctypes.c_void_p, _c_u8p, _c_u8p]
    lib.bamparse_export_stats.restype = None
    lib.bamparse_export_stats.argtypes = [ctypes.c_void_p, ctypes.c_int, _c_i64p]
    lib.bamparse_free.restype = None
    lib.bamparse_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "samparse_run"):
        lib.samparse_run.restype = ctypes.c_void_p
        lib.samparse_run.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, _c_i32p, _c_i64p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
    if hasattr(lib, "bgzf_compress"):
        lib.bgzf_compress_bound.restype = ctypes.c_int64
        lib.bgzf_compress_bound.argtypes = [ctypes.c_int64]
        lib.bgzf_compress.restype = ctypes.c_int64
        lib.bgzf_compress.argtypes = [
            _c_u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, _c_u8p,
        ]
    _lib = lib
    return _lib


def _p8(a: Optional[np.ndarray]):
    if a is None or a.size == 0:
        return _c_u8p()
    return a.ctypes.data_as(_c_u8p)


def _p32(a: Optional[np.ndarray]):
    if a is None or a.size == 0:
        return _c_i32p()
    return a.ctypes.data_as(_c_i32p)


STAT_MAXL = 4096
STAT_QSIZE = 100
STAT_NCODES = 5
_STAT_WORDS = 1 + (STAT_MAXL + 1) + STAT_QSIZE + STAT_QSIZE * STAT_QSIZE \
    + STAT_QSIZE * STAT_NCODES


@dataclass
class NativeStats:
    """One category's streaming read statistics, computed in the walker
    (exact mirror of io/reads.py ReadStats.add_reads semantics)."""

    n_reads: int
    len_counts: np.ndarray  # [STAT_MAXL+1] int64
    q_init: np.ndarray  # [QSIZE]
    q_tran: np.ndarray  # [QSIZE, QSIZE]
    noise: np.ndarray  # [QSIZE, NCODES]


@dataclass
class CatFlat:
    """One unaligned category's flat payloads."""

    n: int
    seq1: np.ndarray
    qual1: Optional[np.ndarray]
    len1: np.ndarray
    seq2: Optional[np.ndarray]
    qual2: Optional[np.ndarray]
    len2: Optional[np.ndarray]


@dataclass
class NativeParse:
    """Flat arrays from the sidecar; order is BAM file order per category."""

    n1: int
    seq1: np.ndarray  # concatenated oriented base codes of N1 mate-1 reads
    qual1: Optional[np.ndarray]
    len1: np.ndarray
    seq2: Optional[np.ndarray]
    qual2: Optional[np.ndarray]
    len2: Optional[np.ndarray]
    nh: np.ndarray  # hits per N1 read
    sid: np.ndarray  # signed sid per hit
    pos: np.ndarray
    ins: Optional[np.ndarray]
    cat0: CatFlat
    cat2: CatFlat
    lq1: Optional[np.ndarray] = None  # per-mate low-quality flags (uint8)
    lq2: Optional[np.ndarray] = None
    stats: Optional[dict] = None  # {cat: NativeStats}
    n_iso_multi: int = 0


def parse_bam_native(
    path: str,
    paired: bool,
    has_qual: bool,
    e2i: np.ndarray,
    target_lens: np.ndarray,
    filter_tag: str,
    n_threads: Optional[int] = None,
    has_polya: bool = False,
    seed_len: int = 25,
) -> Optional[NativeParse]:
    """Run the sidecar; None if the native library is unavailable.

    Raises ValueError with the sidecar's message on malformed input (same
    failure surface as the Python path)."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    e2i = np.ascontiguousarray(e2i, dtype=np.int32)
    target_lens = np.ascontiguousarray(target_lens, dtype=np.int64)
    errbuf = ctypes.create_string_buffer(512)
    tag = filter_tag.encode() if filter_tag and len(filter_tag) == 2 else b""
    h = lib.bamparse_run(
        path.encode(), int(paired), int(has_qual),
        e2i.ctypes.data_as(_c_i32p), target_lens.ctypes.data_as(_c_i64p),
        len(e2i), tag, int(n_threads), int(has_polya), int(seed_len),
        errbuf, len(errbuf),
    )
    if not h:
        raise ValueError(errbuf.value.decode(errors="replace"))
    return _export_handle(lib, h, paired, has_qual)


def _export_handle(lib, h, paired: bool, has_qual: bool) -> NativeParse:
    """Copy a finished parse handle's arrays out and free it."""
    try:
        sizes = np.zeros(18, dtype=np.int64)
        lib.bamparse_sizes(h, sizes.ctypes.data_as(_c_i64p))
        (n1, n_hits, s1_tot, s2_tot, c0n, c0s1, c0s2, c2n, c2s1, c2s2) = (
            int(x) for x in sizes[:10]
        )
        n_iso_multi = int(sizes[10])

        def alloc(n, dtype):
            return np.empty(n, dtype=dtype)

        seq1 = alloc(s1_tot, np.uint8)
        qual1 = alloc(s1_tot, np.uint8) if has_qual else None
        len1 = alloc(n1, np.int32)
        seq2 = alloc(s2_tot, np.uint8) if paired else None
        qual2 = alloc(s2_tot, np.uint8) if (paired and has_qual) else None
        len2 = alloc(n1, np.int32) if paired else None
        nh = alloc(n1, np.int32)
        sid = alloc(n_hits, np.int32)
        pos = alloc(n_hits, np.int32)
        ins = alloc(n_hits, np.int32) if paired else None
        lib.bamparse_export_n1(
            h, _p8(seq1), _p8(qual1), _p32(len1), _p8(seq2), _p8(qual2),
            _p32(len2), _p32(nh), _p32(sid), _p32(pos), _p32(ins),
        )

        def cat(ci, n, stot1, stot2):
            cs1 = alloc(stot1, np.uint8)
            cq1 = alloc(stot1, np.uint8) if has_qual else None
            cl1 = alloc(n, np.int32)
            cs2 = alloc(stot2, np.uint8) if paired else None
            cq2 = alloc(stot2, np.uint8) if (paired and has_qual) else None
            cl2 = alloc(n, np.int32) if paired else None
            lib.bamparse_export_cat(
                h, ci, _p8(cs1), _p8(cq1), _p32(cl1), _p8(cs2), _p8(cq2),
                _p32(cl2),
            )
            return CatFlat(n, cs1, cq1, cl1, cs2, cq2, cl2)

        lq1 = alloc(n1, np.uint8)
        lq2 = alloc(n1, np.uint8) if paired else None
        lib.bamparse_export_lq(h, _p8(lq1), _p8(lq2))

        stats = {}
        for ci in (0, 1, 2):
            buf = np.zeros(_STAT_WORDS, dtype=np.int64)
            lib.bamparse_export_stats(h, ci, buf.ctypes.data_as(_c_i64p))
            o = 1
            lc = buf[o:o + STAT_MAXL + 1]; o += STAT_MAXL + 1
            qi = buf[o:o + STAT_QSIZE]; o += STAT_QSIZE
            qt = buf[o:o + STAT_QSIZE * STAT_QSIZE].reshape(
                STAT_QSIZE, STAT_QSIZE); o += STAT_QSIZE * STAT_QSIZE
            nz = buf[o:o + STAT_QSIZE * STAT_NCODES].reshape(
                STAT_QSIZE, STAT_NCODES)
            stats[ci] = NativeStats(int(buf[0]), lc, qi, qt, nz)

        return NativeParse(
            n1=n1, seq1=seq1, qual1=qual1, len1=len1,
            seq2=seq2, qual2=qual2, len2=len2,
            nh=nh, sid=sid, pos=pos, ins=ins,
            cat0=cat(0, c0n, c0s1, c0s2),
            cat2=cat(2, c2n, c2s1, c2s2),
            lq1=lq1, lq2=lq2, stats=stats, n_iso_multi=n_iso_multi,
        )
    finally:
        lib.bamparse_free(h)


def parse_sam_native(
    path: str,
    paired: bool,
    has_qual: bool,
    target_names,
    e2i: np.ndarray,
    target_lens: np.ndarray,
    filter_tag: str,
    has_polya: bool = False,
    seed_len: int = 25,
) -> Optional[NativeParse]:
    """SAM-text twin of parse_bam_native (same Walker in C++; lines are
    re-encoded as BAM records internally). None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "samparse_run"):
        return None
    e2i = np.ascontiguousarray(e2i, dtype=np.int32)
    target_lens = np.ascontiguousarray(target_lens, dtype=np.int64)
    names_blob = b"".join(n.encode() + b"\0" for n in target_names)
    errbuf = ctypes.create_string_buffer(512)
    tag = filter_tag.encode() if filter_tag and len(filter_tag) == 2 else b""
    h = lib.samparse_run(
        path.encode(), int(paired), int(has_qual), names_blob,
        e2i.ctypes.data_as(_c_i32p), target_lens.ctypes.data_as(_c_i64p),
        len(e2i), tag, int(has_polya), int(seed_len), errbuf, len(errbuf),
    )
    if not h:
        raise ValueError(errbuf.value.decode(errors="replace"))
    return _export_handle(lib, h, paired, has_qual)


def bgzf_compress_native(data, level: int = 6,
                         n_threads: Optional[int] = None) -> Optional[bytes]:
    """Parallel BGZF compression of `data` (bytes-like) into complete
    <=65280-byte members; None when the native library is unavailable.
    The write-side counterpart of the parallel block inflate (the reference
    uses hts_set_threads for this, BamWriter.h:72)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "bgzf_compress"):
        return None
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    if buf.size == 0:
        return b""
    out = np.empty(int(lib.bgzf_compress_bound(buf.size)), dtype=np.uint8)
    n = lib.bgzf_compress(buf.ctypes.data_as(_c_u8p), buf.size, int(level),
                          int(n_threads), out.ctypes.data_as(_c_u8p))
    if n < 0:
        return None
    return out[:n].tobytes()
