"""Fused Pallas kernel: batched banded-chain panel QR (segment-per-lane).

The banded-blocked factorization is a sequential chain of small panel QRs with
an R-overlap carry (/root/reference/src/QRKit/BandedBlockedSparseQR.h:442-519).
The XLA form (``lax.scan`` of an unrolled compact-WY panel QR,
``solvers/banded_blocked.py``) is correct but latency-bound: every scan step
lowers to dozens of tiny fused kernels, so a 20k-block chain pays hundreds of
thousands of kernel launches.  The segmented solver removes the *sequential*
latency by vmapping S independent segment chains — but each of the L scan
steps still launches the same tiny-op soup.

This kernel is the speed-of-light tier for phase 1 of the segmented solver:

* **Segment-per-lane SoA**: the S segment chains live structure-of-arrays —
  every per-panel scalar of the Householder recurrence is a ``[8, 128]`` VPU
  tile holding that scalar for 1024 segments.  The whole chain runs as ONE
  kernel: ``grid = (segment_tiles, L)`` with the R-overlap carry in VMEM
  scratch, persisting across the sequential ``l`` grid steps.  Zero kernel
  launches per chain step; the only HBM traffic is panels in, factors out.
* **Identical math to the XLA path**: Eigen-convention reflectors
  (``beta = -sign(x0)·norm``, ``tau = (beta-x0)/beta``, degenerate columns
  → ``tau = 0``), unit-diagonal Y, carry = static ``triu(R)`` slice shifted
  by the uniform column step — bit-comparable to
  ``_banded_factorize_chunk`` up to fp reassociation.  The triangular T
  factor is built OUTSIDE by a batched :func:`build_t_factor` (a handful of
  batched matmuls), so downstream ``TwoSegmentWYSeq`` machinery is untouched.

Geometry restrictions (gated by the caller, else it falls back to XLA):
uniform carry depth after step 0, uniform column step with at most a distinct
first-step increment on segments 1.. (the dropped leading overlap), panels
pre-shifted so block rows sit below the carry rows.  This is exactly the
uniform-chain case the segmented solver already requires.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_segment_chains_soa", "seg_pad", "SEG_STEP"]

_LANE = 128
_SUB = 8
SEG_STEP = _SUB * _LANE  # 1024 segments per grid tile


def seg_pad(s: int) -> int:
    """Segment axis padding granularity: one [8, 128] tile = 1024 lanes."""
    return -(-s // SEG_STEP) * SEG_STEP


def _chain_kernel(ma: int, mc: int, mca: int, me: int, ci: int, ci0_rest: int):
    """Kernel body for one (segment-tile, l) grid step.

    Refs (leading block axis of size 1 dropped by integer indexing):
      p_ref   [1, ma*mc, 8, 128]   shifted panel, entry (r, c) at r*mc + c
      act_ref [1, 1, 8, 128]       1.0 = active step for this (segment, l)
      y_ref   [1, ma*mc, 8, 128]   unit-diagonal Y out
      tau_ref [1, mc, 8, 128]      reflector taus out
      v_ref   [1, me*mc, 8, 128]   triu(R) emit rows out
      carry   [mca*mc, 8, 128]     VMEM scratch, persists across l steps
    """

    def kernel(p_ref, act_ref, y_ref, tau_ref, v_ref, carry):
        l = pl.program_id(1)
        first_tile = pl.program_id(0) == 0

        @pl.when(l == 0)
        def _reset():
            carry[...] = jnp.zeros(carry.shape, carry.dtype)

        a = [[p_ref[0, r * mc + c] for c in range(mc)] for r in range(ma)]
        act = act_ref[0, 0] > 0.5
        cold = [[carry[r * mc + c] for c in range(mc)] for r in range(mca)]
        for r in range(mca):
            for c in range(mc):
                a[r][c] = a[r][c] + cold[r][c]

        one = jnp.ones_like(a[0][0])
        zero = jnp.zeros_like(a[0][0])

        # unrolled Householder QR, Eigen/_householder_column conventions
        for j in range(mc):
            x0 = a[j][j]
            sigma = zero
            for r in range(j + 1, ma):
                sigma = sigma + a[r][j] * a[r][j]
            norm = jnp.sqrt(x0 * x0 + sigma)
            beta = jnp.where(x0 >= 0, -norm, norm)
            degen = sigma <= 0
            denom = jnp.where(degen, one, x0 - beta)
            safe_beta = jnp.where(norm == 0, one, beta)
            tau = jnp.where(degen, zero, (beta - x0) / safe_beta)
            v = [zero] * ma
            v[j] = one
            for r in range(j + 1, ma):
                v[r] = a[r][j] / denom
            for c in range(j, mc):
                w = zero
                for r in range(j, ma):
                    w = w + v[r] * a[r][c]
                w = tau * w
                for r in range(j, ma):
                    a[r][c] = a[r][c] - v[r] * w
            tau_ref[0, j] = jnp.where(act, tau, zero)
            for r in range(ma):
                y_ref[0, r * mc + j] = jnp.where(act, v[r], zero)

        # emit rows of triu(R)
        for r in range(me):
            for c in range(mc):
                val = a[r][c] if c >= r else zero
                v_ref[0, r * mc + c] = jnp.where(act, val, zero)

        # next carry = triu(R)[shift : shift+mca, shift : shift+mc], zero-padded.
        # The shift is the uniform column step, except the first step of
        # segments 1.. (leading overlap dropped from the local panel) — a
        # per-lane select between the two static slices.
        iota_s = jax.lax.broadcasted_iota(jnp.int32, a[0][0].shape, 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, a[0][0].shape, 1)
        seg0 = first_tile & (iota_s == 0) & (iota_l == 0)
        use_rest = (l == 0) & (~seg0)

        def tri(r, c):
            if r < 0 or c < 0 or r >= ma or c >= mc or r > c:
                return zero
            return a[r][c]

        for r in range(mca):
            for c in range(mc):
                body = tri(r + ci, c + ci)
                alt = tri(r + ci0_rest, c + ci0_rest)
                new = jnp.where(use_rest, alt, body) if ci0_rest != ci else body
                carry[r * mc + c] = jnp.where(act, new, cold[r][c])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("ma", "mc", "mca", "me", "ci", "ci0_rest", "interpret"),
)
def pallas_segment_chains_soa(
    panels_soa: jnp.ndarray,  # [L, ma*mc, npad] shifted panels, SoA
    act_soa: jnp.ndarray,  # [L, 1, npad] 1.0/0.0 step-activity mask
    *,
    ma: int,
    mc: int,
    mca: int,
    me: int,
    ci: int,
    ci0_rest: int,
    interpret: bool = False,
):
    """S independent banded chains of L steps, one kernel launch.

    Returns ``(y_soa [L, ma*mc, npad], tau_soa [L, mc, npad],
    v_soa [L, me*mc, npad])`` matching the XLA scan's per-step
    ``(Y, taus, triu(R)[:me])`` exactly (inactive steps zeroed, carry passed
    through).  ``npad`` must be a multiple of :data:`SEG_STEP`; padded lanes
    compute garbage that the caller discards.
    """
    L, e, npad = panels_soa.shape
    if e != ma * mc:
        raise ValueError(f"panel entry axis {e} != ma*mc = {ma * mc}")
    if npad % SEG_STEP:
        raise ValueError(f"segment axis {npad} not a multiple of {SEG_STEP}")
    dt = panels_soa.dtype
    nt = npad // _LANE
    p4 = panels_soa.reshape(L, e, nt, _LANE)
    a4 = act_soa.reshape(L, 1, nt, _LANE)
    grid = (npad // SEG_STEP, L)
    spec = lambda k: pl.BlockSpec(
        (1, k, _SUB, _LANE), lambda i, l: (l, 0, i, 0), memory_space=pltpu.VMEM
    )
    y4, t4, v4 = pl.pallas_call(
        _chain_kernel(ma, mc, mca, me, ci, ci0_rest),
        out_shape=(
            jax.ShapeDtypeStruct((L, ma * mc, nt, _LANE), dt),
            jax.ShapeDtypeStruct((L, mc, nt, _LANE), dt),
            jax.ShapeDtypeStruct((L, me * mc, nt, _LANE), dt),
        ),
        grid=grid,
        in_specs=[spec(ma * mc), spec(1)],
        out_specs=(spec(ma * mc), spec(mc), spec(me * mc)),
        scratch_shapes=[pltpu.VMEM((mca * mc, _SUB, _LANE), dt)],
        interpret=interpret,
    )(p4, a4)
    return (
        y4.reshape(L, ma * mc, npad),
        t4.reshape(L, mc, npad),
        v4.reshape(L, me * mc, npad),
    )
