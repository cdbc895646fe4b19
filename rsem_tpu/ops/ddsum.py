"""Vectorized double-float (float32 pair) accumulation primitives.

TPUs have no hardware float64 — JAX emulates it, and enabling the global
x64 flag also widens every weakly-typed integer to i64, which poisons the
index math of unrelated kernels (measured: the conprb pass slowed by >10x
under x64). These helpers provide the ~48-bit effective precision the EM
count accumulators need (count magnitudes up to 1e9 reads against the
reference's 1e-3 relative convergence test, EM.cpp:53-55) using only f32
ops, so the engine never needs the x64 flag.

The representation is the classic double-double pair (hi, lo) with
|lo| <= ulp(hi)/2, built on Knuth's branch-free TwoSum. All ops are
elementwise/vectorized; the cumulative sum uses jax.lax.associative_scan
(log-depth, vector-wide) — double-float addition is not exactly
associative, but tree re-association only perturbs the compensation term
(error O(eps^2) of the running sum), which is the same guarantee the
sequential version gives.

References: Dekker (1971), Knuth TAOCP vol.2 §4.2.2, Hida-Li-Bailey QD.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DD = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo), same shape


def two_sum(a: jnp.ndarray, b: jnp.ndarray) -> DD:
    """Exact sum: s + e == a + b with s = fl(a+b). Branch-free (6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def dd_from(x: jnp.ndarray) -> DD:
    return x, jnp.zeros_like(x)


def two_prod(a: jnp.ndarray, b: jnp.ndarray) -> DD:
    """Exact product p + e == a*b via Dekker splitting (no FMA primitive
    is exposed through XLA; the 2^12+1 split is the f32 constant)."""
    p = a * b
    split = jnp.float32(4097.0)
    aa = a * split
    ahi = aa - (aa - a)
    alo = a - ahi
    bb = b * split
    bhi = bb - (bb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def dd_sq(x: jnp.ndarray) -> DD:
    """x*x as an exact double-float pair."""
    return two_prod(x, x)


def dd_add(x: DD, y: DD) -> DD:
    """(hi,lo) + (hi,lo), renormalized."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def dd_add_f32(x: DD, y: jnp.ndarray) -> DD:
    s, e = two_sum(x[0], y)
    e = e + x[1]
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def dd_neg(x: DD) -> DD:
    return -x[0], -x[1]


def dd_to_f32(x: DD) -> jnp.ndarray:
    return x[0] + x[1]


def dd_cumsum(x: jnp.ndarray) -> DD:
    """Inclusive cumulative sum of an f32 vector in double-float."""
    return jax.lax.associative_scan(dd_add, dd_from(x))


def dd_sum(x: jnp.ndarray) -> DD:
    """Double-float total of an f32 vector (tree reduction)."""
    n = x.shape[0]
    hi, lo = dd_from(x)
    while n > 1:
        half = n // 2
        even_h, even_l = hi[: 2 * half : 2], lo[: 2 * half : 2]
        odd_h, odd_l = hi[1 : 2 * half : 2], lo[1 : 2 * half : 2]
        h2, l2 = dd_add((even_h, even_l), (odd_h, odd_l))
        if n % 2:
            h2 = jnp.concatenate([h2, hi[-1:]])
            l2 = jnp.concatenate([l2, lo[-1:]])
        hi, lo = h2, l2
        n = hi.shape[0]
    return hi[0], lo[0]


def dd_diff_f32(hi_a: jnp.ndarray, lo_a: jnp.ndarray,
                hi_b: jnp.ndarray, lo_b: jnp.ndarray) -> jnp.ndarray:
    """f32 value of (a - b) where a, b are dd pairs whose hi parts may
    cancel catastrophically (adjacent cumulative sums): the exact TwoSum
    residual recovers the bits the f32 subtraction loses."""
    s, e = two_sum(hi_a, -hi_b)
    return s + (e + (lo_a - lo_b))
