"""Segmented banded QR — the sequential chain, parallelized by composition.

The plain banded solver's ``lax.scan`` has inherent per-step latency: a chain
of nb blocks costs nb sequential steps (BandedBlockedSparseQR.h:463-508 has the
same serialization on CPU).  This solver removes it with the *composition* idea
the reference's own paper advertises, arranged for SPMD hardware:

Split the chain into S segments of L blocks.  Declare the first ``o`` columns
of each segment (the overlap shared with the previous segment) **boundary**
columns and the rest **interior**.  Under the column permutation
``P_split = [interior_0, interior_1, ..., | boundaries]`` the matrix becomes
block-angular::

    A · P_split = [ A_I | A_B ]

where ``A_I`` is *block-diagonal over segments* (segment rows touch only their
own interior columns) and ``A_B`` is a thin dense-ish block of boundary
columns.  Then the standard block-angular algorithm applies
(BlockAngularSparseQR.h:458-514):

1. QR of ``A_I``   — S independent banded chains, run as ONE ``vmap`` over the
   segment axis: sequential latency drops from nb steps to L steps.
2. ``J2 = Q1ᵀ A_B`` — batched implicit-Q product.  A_B is *structured*: a
   segment's rows touch only its own two adjacent boundary-column groups
   (≤ 2·o columns), so A_B is stored and transformed as per-segment
   ``[rows, 2o]`` slabs, never as a dense ``[m, S·o]`` operand.
3. QR of the lower rows of J2.  Those rows inherit the slab structure —
   segment s's bottom rows live in boundary columns ``[(s-1)o, (s+1)o)`` —
   so stacked over segments they form ANOTHER banded-blocked matrix: a chain
   of S blocks of ``[rows_bot, 2o]`` stepping o columns.  Phase 3 is therefore
   a recursive (tiny) :func:`banded_factorize` chain instead of one
   ``[m-m1, S·o]`` dense QR — S sequential steps on ``[rows_bot + 2o, 2o]``
   panels.
4. R assembly / permutation composition / two-phase solve (the boundary
   back-substitution is :func:`banded_solve_r` on the chain's R panels).

The same decomposition is the multi-chip distribution of the banded family:
shard the segment axis; only the (tiny) boundary chain crosses segments.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis import as_banded_as_possible, block_banded_info, from_block_banded_pattern
from ..ops.compact_wy import TwoSegmentWYSeq
from ..ops.householder import highest_precision, panel_qr_yt_soa
from ..sparse import Permutation, SparseCSR
from .banded_blocked import _banded_factorize_chunk, _banded_solve_chunk, banded_geometry
from .base import ComputationInfo, QRSolver, _diag_health

__all__ = ["SegmentedBandedQR"]


def _imap(a) -> jnp.ndarray:
    """Device index map in int32 when every index fits (they are bounded by
    nrows/nnz, < 2³¹ for any realizable single-chip problem): index arrays
    are the dominant *read* of gather-heavy solve/factorize stages, so
    halving their bytes halves that traffic.  Falls back to int64 past 2³¹."""
    a = np.asarray(a)
    if a.size == 0 or (a.min() >= -(2**31) and a.max() < 2**31 - 1):
        return jnp.asarray(np.ascontiguousarray(a, dtype=np.int32))
    return jnp.asarray(np.ascontiguousarray(a))


@functools.partial(jax.jit, static_argnames=("max_carry", "max_emit"))
def _vmapped_chain(C0, shifted, col_inc, active, **kw):
    """vmap of the banded scan chunk over the segment axis."""
    f = lambda c, s, ci, a: _banded_factorize_chunk(c, s, ci, a, **kw)
    return jax.vmap(f)(C0, shifted, col_inc, active)


@functools.partial(jax.jit, static_argnames=("h1", "transpose"))
@highest_precision
def _segment_apply_cols(Yws, Ts, s1, s2, split, vt, h1: int, transpose: bool):
    """Per-segment two-segment Q/Qᵀ apply on LANE-MAJOR operands [S, k, rows].

    Same math as :func:`_segment_apply`, but the operand is stored transposed
    so the long row axis sits in TPU lanes: a [seg_rows, k] operand with
    k ≪ 128 (a 2o-column slab, or k=1 for a solve vector) is physically
    padded up to 128 lanes — 16–128× its logical size; as [k, seg_rows] the
    padding is gone and every per-step dynamic slice/update moves that much
    less.  Used on the factorize (Qᵀ·A_B) and fused-solve paths; general
    matrix applies keep the row-major form.
    """
    S, k, R = vt.shape
    A = Yws.shape[2]
    jA = jax.lax.broadcasted_iota(jnp.int32, (A,), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (h1,), 0)

    def one(Y, T, a1, a2, sp, v):
        vp = jnp.concatenate([v, jnp.zeros((k, h1 + A), v.dtype)], axis=1)

        def body(carry, blk):
            Yk, Tk, s1v, s2v, spv = blk
            zero = jnp.zeros((), s1v.dtype)
            w1 = jax.lax.dynamic_slice(carry, (zero, s1v), (k, h1))
            w2 = jax.lax.dynamic_slice(carry, (zero, s2v), (k, A))
            wg = jnp.where(
                (jA < spv)[None, :],
                w1[:, jnp.clip(jA, 0, h1 - 1)],
                w2[:, jnp.clip(jA - spv, 0, A - 1)],
            )
            # (Y (T' (Yᵀ w)))ᵀ = wᵀ Y T'ᵀ Yᵀ;  Qᵀ uses T' = Tᵀ, Q uses T
            Tt = Tk if transpose else Tk.T
            wg = wg + ((wg @ Yk) @ Tt) @ Yk.T
            w1o = jnp.where((j1 < spv)[None, :], wg[:, jnp.clip(j1, 0, A - 1)], w1)
            w2o = jnp.where(
                (jA + spv < A)[None, :], wg[:, jnp.clip(jA + spv, 0, A - 1)], w2
            )
            carry = jax.lax.dynamic_update_slice(carry, w1o, (zero, s1v))
            carry = jax.lax.dynamic_update_slice(carry, w2o, (zero, s2v))
            return carry, None

        out, _ = jax.lax.scan(
            body, vp, (Y, T, a1, a2, sp), reverse=not transpose
        )
        return out[:, :R]

    return jax.vmap(one)(Yws, Ts, s1, s2, split, vt)


@functools.partial(jax.jit, static_argnames=("h1", "transpose"))
@highest_precision
def _segment_apply_cols_shared(Yws, Ts, s1u, s2u, spu, vt, h1: int, transpose: bool):
    """Uniform-geometry batch form of :func:`_segment_apply_cols`.

    On a uniform chain every segment after the first shares ONE window-scalar
    sequence (s1/s2/split per chain step — verified by the caller's
    ``_p2_uniform`` gate), so each step's windows can be cut with a single
    batch ``dynamic_slice`` over all segments.  The vmapped per-segment form
    lowers those slices to gathers over the whole work buffer and dominated
    the factorize pipeline (144 ms of 241 ms at 20k blocks).  Segments whose
    trailing steps are inactive (the padded tail) are exact no-ops under
    shared scalars: with ``Y = T = 0`` the update vanishes and the
    recomposed windows write back exactly the values they gathered.
    """
    S, k, R = vt.shape
    A = Yws.shape[2]
    jA = jax.lax.broadcasted_iota(jnp.int32, (A,), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (h1,), 0)
    vp = jnp.concatenate([vt, jnp.zeros((S, k, h1 + A), vt.dtype)], axis=2)
    Yl = jnp.moveaxis(Yws, 0, 1)  # [L, S, A, mc]
    Tl = jnp.moveaxis(Ts, 0, 1)

    def body(carry, blk):
        Yk, Tk, s1v, s2v, spv = blk
        zero = jnp.zeros((), s1v.dtype)
        w1 = jax.lax.dynamic_slice(carry, (zero, zero, s1v), (S, k, h1))
        w2 = jax.lax.dynamic_slice(carry, (zero, zero, s2v), (S, k, A))
        # composed-window tail in ONE slice: position s2v-spv+j equals
        # w2[j-spv] exactly where j >= spv (the gate asserts spv <= s2v)
        wt = jax.lax.dynamic_slice(carry, (zero, zero, s2v - spv), (S, k, A))
        wg = jnp.where(
            (jA < spv)[None, None, :], w1[..., jnp.clip(jA, 0, h1 - 1)], wt
        )
        Tt = Tk if transpose else jnp.swapaxes(Tk, 1, 2)
        wg = wg + ((wg @ Yk) @ Tt) @ jnp.swapaxes(Yk, 1, 2)
        w1o = jnp.where(
            (j1 < spv)[None, None, :], wg[..., jnp.clip(j1, 0, A - 1)], w1
        )
        wgp = jnp.concatenate([wg, jnp.zeros((S, k, h1), wg.dtype)], axis=2)
        w2o = jnp.where(
            (jA + spv < A)[None, None, :],
            jax.lax.dynamic_slice(wgp, (zero, zero, spv), (S, k, A)),
            w2,
        )
        carry = jax.lax.dynamic_update_slice(carry, w1o, (zero, zero, s1v))
        carry = jax.lax.dynamic_update_slice(carry, w2o, (zero, zero, s2v))
        return carry, None

    out, _ = jax.lax.scan(body, vp, (Yl, Tl, s1u, s2u, spu), reverse=not transpose)
    return out[:, :, :R]


@highest_precision
def _segment_apply_cols_shared_static(Yws, Ts, s1t, s2t, spt, vt, h1, transpose):
    """Statically-unrolled form of :func:`_segment_apply_cols_shared`.

    The shared window scalars are PLAN data (host-known integers), so every
    per-step window cut and write-back can be a static ``lax.slice`` /
    ``dynamic_update_slice`` and the masked two-segment recomposition
    collapses to two static slices + one concat.  The ``lax.scan`` form
    re-materializes the whole [S, k, R] work buffer every step — the carry
    is read by three dynamic slices before being updated, which defeats
    in-place aliasing — and measured 11.5 ms of the 39 ms 20k-block
    factorize while its window traffic is ~0.2 ms of HBM time; unrolled
    with static offsets XLA updates the buffer in place.  Inactive trailing
    steps of padded segments are exact no-ops (``Y = T = 0`` makes the
    update vanish and the write-back restores the gathered values).
    """
    S, k, R = vt.shape
    A = Yws.shape[2]
    L = Yws.shape[1]
    carry = jnp.concatenate([vt, jnp.zeros((S, k, h1 + A), vt.dtype)], axis=2)
    order = range(L) if transpose else reversed(range(L))
    for l in order:
        s1, s2, sp = int(s1t[l]), int(s2t[l]), int(spt[l])
        Yk = Yws[:, l]  # [S, A, mc]
        Tk = Ts[:, l]
        Tt = Tk if transpose else jnp.swapaxes(Tk, 1, 2)
        tw = A - sp
        parts = []
        if sp:
            parts.append(jax.lax.slice(carry, (0, 0, s1), (S, k, s1 + sp)))
        if tw:
            parts.append(jax.lax.slice(carry, (0, 0, s2), (S, k, s2 + tw)))
        wg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
        wg = wg + ((wg @ Yk) @ Tt) @ jnp.swapaxes(Yk, 1, 2)
        if sp:
            carry = jax.lax.dynamic_update_slice(carry, wg[:, :, :sp], (0, 0, s1))
        if tw:
            carry = jax.lax.dynamic_update_slice(carry, wg[:, :, sp:], (0, 0, s2))
    return carry[:, :, :R]


def _p2_stream_plan(s1t, s2t, spt, A: int, L: int, R: int):
    """Static analysis enabling the rolling-window phase-2 apply (Qᵀ order).

    The window at step ``l`` spans ``[s1_l, s2_l + (A - sp_l))`` of the
    work vector: lanes left of ``s1_l`` are FINAL (no later step reads or
    writes them — heads march right), lanes right of the previous window
    edge are PRISTINE operand values (writes always land inside the
    window).  Valid iff ``s1`` is nondecreasing and each step's head
    ``[s1, s1+sp)`` precedes its tail ``[s2, s2+A-sp)`` disjointly.

    Two live-window shapes are planned here (``None`` when neither holds):

    ``mono`` — one contiguous window ``[s1_l, s2_l + tw_l)``.  On *gapped*
    chains (block rows ≫ column step — the head advances ``emit`` lanes per
    step while the tail advances a whole block height) that window grows
    O(L·block_rows) wide and the per-step re-concat costs O(L²) traffic
    (measured 7.2 ms of the 11.5 ms config-3 factorize).

    ``gap`` — two regions split at ``h = max_l(s1_l + sp_l)``, the furthest
    lane any head window ever reaches.  Region A ``[0, h)`` rides in a small
    rolling buffer; each step's tail lanes ≥ ``h`` are read PRISTINE,
    transformed once, and emitted immediately (valid iff those above-``h``
    tail spans are mutually disjoint and nondecreasing — no later step reads
    or writes an emitted lane; heads can't, they stop at ``h``).  Live width
    falls from ~1150 to ~170 lanes on the config-3 chain.

    Returns a dict ``{"mode": "mono"|"gap", "h": int}`` (truthy) or ``None``.
    """
    for l in range(L):
        s1, s2, sp = int(s1t[l]), int(s2t[l]), int(spt[l])
        if sp and s2 < s1 + sp:
            return None
        if l and s1 < int(s1t[l - 1]):
            return None
        if s2 < s1:
            return None
    h = 0
    live_mono = 0
    for l in range(L):
        s1, s2, sp = int(s1t[l]), int(s2t[l]), int(spt[l])
        h = max(h, s1 + sp)
        live_mono = max(live_mono, s2 + (A - sp) - s1)
    gap_ok = True
    rb = h
    for l in range(L):
        s2, sp = int(s2t[l]), int(spt[l])
        tw = A - sp
        if s2 + tw > h:
            if max(s2, h) < rb:
                gap_ok = False
                break
            rb = s2 + tw
    live_gap = h + A
    if gap_ok and 2 * live_gap < live_mono:
        return {"mode": "gap", "h": h}
    return {"mode": "mono", "h": h}


@highest_precision
def _segment_apply_cols_stream(Yws, Ts, s1t, s2t, spt, vt, transpose):
    """Rolling-window form of :func:`_segment_apply_cols_shared_static`
    (Qᵀ order only).

    The unrolled-static form still updates a [S, k, R] HBM buffer twice per
    step, and in the factorize pipeline XLA fails to alias those updates —
    each ``dynamic_update_slice`` measured ~154 µs of whole-buffer copy
    (~10 ms of the 38 ms 20k-block factorize).  Here the work vector is
    never held as an updatable buffer at all: a live window VALUE spanning
    ``[s1_l, s2_l+A-sp_l)`` rolls right over the operand — finalized lanes
    are emitted on the left, pristine operand lanes ingested on the right
    (:func:`_p2_stream_plan` checks the geometry) — and the output is
    assembled with ONE static concat of the emitted chunks, the final
    window, and the untouched operand tail."""
    S, k, R = vt.shape
    A = Yws.shape[2]
    L = Yws.shape[1]
    assert transpose, "streaming form is Qᵀ-order only"
    dt = vt.dtype

    def pristine(lo, hi):
        hi_r = max(min(hi, R), lo)
        parts = []
        if hi_r > lo:
            parts.append(jax.lax.slice(vt, (0, 0, lo), (S, k, hi_r)))
        if hi > hi_r:
            parts.append(jnp.zeros((S, k, hi - hi_r), dt))
        return parts

    plan = _p2_stream_plan(s1t, s2t, spt, A, L, R)
    assert plan is not None, "caller must gate on _p2_stream_plan"
    if plan["mode"] == "gap":
        return _segment_apply_cols_stream_gap(
            Yws, Ts, s1t, s2t, spt, vt, plan["h"], pristine
        )

    emitted = []
    W = jnp.zeros((S, k, 0), dt)
    w0, w1 = 0, 0  # current window coverage [w0, w1)

    for l in range(L):
        s1, s2, sp = int(s1t[l]), int(s2t[l]), int(spt[l])
        tw = A - sp
        if s1 > w0:  # lanes left of s1 are final: emit
            d = min(s1, w1) - w0
            if d > 0:
                emitted.append(W[:, :, :d])
                W = W[:, :, d:]
            if s1 > w1:  # window detached: flush pristine gap
                emitted.extend(pristine(max(w1, w0), s1))
                w1 = s1
            w0 = s1
        end = s2 + tw
        if end > w1:  # ingest pristine lanes on the right
            W = jnp.concatenate([W] + pristine(w1, end), axis=2)
            w1 = end
        Yk = Yws[:, l]
        Tk = Ts[:, l]
        parts = []
        if sp:
            parts.append(W[:, :, : sp])  # head sits at the window start
        if tw:
            parts.append(W[:, :, s2 - w0 : s2 - w0 + tw])
        wg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
        wg = wg + ((wg @ Yk) @ Tk) @ jnp.swapaxes(Yk, 1, 2)
        segs = []
        if sp:
            segs.append(wg[:, :, :sp])
            segs.append(W[:, :, sp : s2 - w0])
        else:
            segs.append(W[:, :, : s2 - w0])
        if tw:
            segs.append(wg[:, :, sp:])
            segs.append(W[:, :, s2 - w0 + tw :])
        W = jnp.concatenate(segs, axis=2)
    pieces = emitted + [W] + pristine(w1, max(R, w1))
    out = jnp.concatenate(pieces, axis=2)
    return out[:, :, :R]


def _segment_apply_cols_stream_gap(Yws, Ts, s1t, s2t, spt, vt, h, pristine):
    """Two-region form of :func:`_segment_apply_cols_stream` for GAPPED
    chains (see ``_p2_stream_plan``'s ``gap`` mode for the geometry proof).

    Region A ``[0, h)`` — every lane any head window ever touches — is
    pre-ingested into a small rolling buffer ``W`` whose left edge emits as
    heads march right; each step's tail lanes ≥ ``h`` are sliced PRISTINE
    from the operand, transformed with the step's WY factor, and emitted
    immediately (they are final: above-``h`` tail spans are disjoint and no
    head reaches them).  Per-step traffic is O(h + A) lanes instead of the
    mono window's O(step · block_rows)."""
    S, k, R = vt.shape
    A = Yws.shape[2]
    L = Yws.shape[1]
    em_l = []  # finalized pieces covering [0, w0)
    em_r = []  # finalized pieces covering [h, rb)
    parts0 = pristine(0, h)
    W = parts0[0] if len(parts0) == 1 else jnp.concatenate(parts0, axis=2)
    w0, rb = 0, h
    for l in range(L):
        s1, s2, sp = int(s1t[l]), int(s2t[l]), int(spt[l])
        tw = A - sp
        if s1 > w0:  # lanes left of s1 are final: emit from the A-buffer
            em_l.append(W[:, :, : s1 - w0])
            W = W[:, :, s1 - w0 :]
            w0 = s1
        below = max(0, min(s2 + tw, h) - s2)  # tail lanes inside region A
        above = tw - below
        parts = []
        if sp:
            parts.append(W[:, :, :sp])  # head sits at the window start
        if below:
            parts.append(W[:, :, s2 - w0 : s2 - w0 + below])
        if above:
            a_lo = max(s2, h)
            if a_lo > rb:  # pristine gap between emitted tails: flush
                em_r.extend(pristine(rb, a_lo))
                rb = a_lo
            parts.extend(pristine(a_lo, s2 + tw))
        wg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
        Yk = Yws[:, l]
        Tk = Ts[:, l]
        wg = wg + ((wg @ Yk) @ Tk) @ jnp.swapaxes(Yk, 1, 2)
        segs = []
        if sp:
            segs.append(wg[:, :, :sp])
        if below:
            segs.append(W[:, :, sp : s2 - w0])
            segs.append(wg[:, :, sp : sp + below])
            segs.append(W[:, :, s2 - w0 + below :])
        else:
            segs.append(W[:, :, sp:])
        W = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=2)
        if above:
            em_r.append(wg[:, :, sp + below :])
            rb = s2 + tw
    pieces = em_l + [W] + em_r + pristine(rb, max(R, rb))
    out = jnp.concatenate(pieces, axis=2)
    return out[:, :, :R]


def _apply_cols_split(
    Yws, Ts, meta, vt, h1: int, transpose: bool, nuni: int, p2s=None,
    gen_static=None,
):
    """Phase-2 lane-major apply on uniform plans: segments ``1..1+nuni``
    (the maximal uniform run found by the plan-time gate) run the
    shared-scalar batch path; segment 0 (distinct local column starts — it
    keeps its leading overlap) and any irregular tail segments (a final
    chain block without trailing overlap changes the last segment's
    geometry) run the general per-segment path.  ``p2s`` carries the shared
    scalars as host tuples when available, selecting the unrolled-static
    uniform path; ``gen_static`` carries each general segment's own scalar
    tuples (trimmed to its active steps) so those 2-3 segments ALSO unroll
    statically — the vmapped 32-step scan over just the irregular segments
    measured 7.5 ms of the 20k-block factorize, pure scan-step latency."""
    S = vt.shape[0]
    e = 1 + nuni
    gi = np.array([0] + list(range(e, S)))
    if transpose and gen_static is not None and len(gen_static) == len(gi):
        # batch-gather the few irregular segments' operands ONCE, then slice
        # the small gathered arrays per segment: per-step slices that remain
        # views of the full factor arrays re-pay the producer transpose on
        # every step (measured 74 ms vs 14.6 ms at 20k blocks)
        Yg, Tg, vg = Yws[gi], Ts[gi], vt[gi]
        outs_g = []
        for k in range(len(gi)):
            s1t, s2t, spt = gen_static[k]
            n = len(s1t)
            outs_g.append(
                _segment_apply_cols_stream(
                    Yg[k : k + 1, :n], Tg[k : k + 1, :n], s1t, s2t, spt,
                    vg[k : k + 1], transpose,
                )
            )
        out_g = jnp.concatenate(outs_g, axis=0)
    else:
        out_g = _segment_apply_cols(
            Yws[gi], Ts[gi], meta["starts"][gi], meta["rows2d"][gi],
            meta["carry2d"][gi], vt[gi], h1, transpose,
        )
    if p2s is not None:
        stream = p2s[3] if len(p2s) > 3 else None
        if transpose and stream is not None:
            out_u = _segment_apply_cols_stream(
                Yws[1:e], Ts[1:e], p2s[0], p2s[1], p2s[2], vt[1:e], transpose
            )
        else:
            out_u = _segment_apply_cols_shared_static(
                Yws[1:e], Ts[1:e], p2s[0], p2s[1], p2s[2], vt[1:e], h1,
                transpose,
            )
    else:
        out_u = _segment_apply_cols_shared(
            Yws[1:e], Ts[1:e], meta["s1u"], meta["s2u"], meta["spu"],
            vt[1:e], h1, transpose,
        )
    return jnp.concatenate([out_g[:1], out_u, out_g[1:]], axis=0)


@functools.partial(jax.jit, static_argnames=("max_emit", "max_cols"))
@highest_precision
def _banded_solve_chunk_shared(
    ypad, r_panels, cols_u, emit_u, ncols_u, active, *, max_emit: int, max_cols: int
):
    """Uniform-geometry batch form of :func:`_banded_solve_chunk`.

    On a uniform chain every interior segment shares ONE (col-offset,
    emit-rows, ncols) sequence per back-substitution step, so each step's
    solution/RHS windows are cut with a single batch ``dynamic_slice``
    instead of per-segment slices (which vmap lowers to gathers over the
    whole work buffer — that, plus a batched 10×10 ``triangular_solve``,
    made the interior back-substitution 94 ms of the 107 ms fused solve at
    20k blocks).  The per-block triangular solve is unrolled over the ≤16
    emit rows as lane-wide vector ops; per-segment activity stays a vector
    select.  ``ypad`` [B, nloc+max_cols]; ``r_panels`` [B, L, me, mc];
    shared scalars [L]; ``active`` [B, L]."""
    B = ypad.shape[0]
    dt = r_panels.dtype
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (max_emit,), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (max_cols,), 0)
    one = jnp.ones((), dt)
    zerov = jnp.zeros((), dt)

    def body(xcarry, xs):
        V, c0, er, nc, act = xs  # V [B, me, mc]; c0/er/nc scalars; act [B]
        zero = jnp.zeros((), c0.dtype)
        xwin = jax.lax.dynamic_slice(xcarry, (zero, c0), (B, max_cols))
        maskj = (c_iota >= er) & (c_iota < nc)
        rhs_sub = jnp.einsum("bec,bc->be", V, jnp.where(maskj[None], xwin, zerov))
        yblk = jax.lax.dynamic_slice(ypad, (zero, c0), (B, max_emit))
        rhs = jnp.where((r_iota < er)[None], yblk - rhs_sub, zerov)
        xcols = [None] * max_emit
        for i in range(max_emit - 1, -1, -1):
            s = rhs[:, i]
            for j in range(i + 1, max_emit):
                s = s - V[:, i, j] * xcols[j]
            xi = s / jnp.where(i < er, V[:, i, i], one)
            xcols[i] = jnp.where(i < er, xi, zerov)
        xblk = jnp.stack(xcols, axis=1)  # [B, me]
        old = jax.lax.dynamic_slice(xcarry, (zero, c0), (B, max_emit))
        new = jnp.where((r_iota < er)[None] & act[:, None], xblk, old)
        return jax.lax.dynamic_update_slice(xcarry, new, (zero, c0)), None

    Vl = jnp.moveaxis(r_panels, 0, 1)  # [L, B, me, mc]
    xpad, _ = jax.lax.scan(
        body,
        jnp.zeros_like(ypad),
        (Vl, cols_u, emit_u, ncols_u, active.T),
        reverse=True,
    )
    return xpad


def _banded_solve_chunk_shared_static(
    ypad, r_panels, colst, emitt, ncolst, active, *, max_cols: int
):
    """Statically-unrolled form of :func:`_banded_solve_chunk_shared`.

    The shared (col-offset, emit-rows, ncols) sequences are PLAN data, so
    every window cut/update is a static slice (XLA keeps the solution buffer
    in place) and the per-step triangular solve unrolls only the step's
    ``er`` real rows — the ``lax.scan`` form cost ~27 µs/step of pure step
    latency (0.87 ms of the 3.7 ms config-3 fused solve at L=32).  Inactive
    steps of padded segments are masked by ``active`` exactly as in the scan
    form (their zero pivots produce non-finite lanes that the select drops);
    ``active=None`` asserts every step is live (the trimmed general-segment
    tuples)."""
    B = ypad.shape[0]
    dt = r_panels.dtype
    L = len(colst)
    zerov = jnp.zeros((), dt)
    xpad = jnp.zeros_like(ypad)
    cj = np.arange(max_cols)
    for l in range(L - 1, -1, -1):
        c0, er, nc = int(colst[l]), int(emitt[l]), int(ncolst[l])
        if er == 0:
            continue
        V = r_panels[:, l]  # [B, me, mc]
        xwin = jax.lax.slice(xpad, (0, c0), (B, c0 + max_cols))
        maskj = (cj >= er) & (cj < nc)
        rhs_sub = highest_precision(jnp.einsum)(
            "bec,bc->be",
            V[:, :er, :],
            jnp.where(jnp.asarray(maskj)[None], xwin, zerov),
        )
        rhs = jax.lax.slice(ypad, (0, c0), (B, c0 + er)) - rhs_sub
        xcols = [None] * er
        for i in range(er - 1, -1, -1):
            s = rhs[:, i]
            for j in range(i + 1, er):
                s = s - V[:, i, j] * xcols[j]
            xcols[i] = s / V[:, i, i]
        xblk = jnp.stack(xcols, axis=1)  # [B, er]
        if active is not None:
            xblk = jnp.where(
                active[:, l][:, None],
                xblk,
                jax.lax.slice(xpad, (0, c0), (B, c0 + er)),
            )
        xpad = jax.lax.dynamic_update_slice(xpad, xblk, (0, c0))
    return xpad


def _interior_backsub_split(
    ypad, r_panels, meta, max_emit: int, max_cols: int, nuni: int,
    bss=None, bs_gen=None,
):
    """Interior back-substitution on uniform plans: segments ``1..1+nuni``
    run the shared-scalar batch path; segment 0 and irregular tail segments
    run the general vmapped per-segment chunk (mirrors
    :func:`_apply_cols_split`).  ``bss``/``bs_gen`` carry the shared / the
    per-general-segment scalar sequences as host tuples when available,
    selecting the unrolled-static forms.  Returns ``xs`` [S, nloc+max_cols]."""
    S = ypad.shape[0]
    e = 1 + nuni
    gi = np.array([0] + list(range(e, S)))
    if bs_gen is not None and len(bs_gen) == len(gi):
        yg, rg = ypad[gi], r_panels[gi]
        outs_g = []
        for k in range(len(gi)):
            ct, et, nt = bs_gen[k]
            n = len(ct)
            outs_g.append(
                _banded_solve_chunk_shared_static(
                    yg[k : k + 1], rg[k : k + 1, :n], ct, et, nt, None,
                    max_cols=max_cols,
                )
            )
        xs_g = jnp.concatenate(outs_g, axis=0)
    else:
        xs_g = jax.vmap(
            lambda xp, yp, rp, cs, er, nc, act: _banded_solve_chunk(
                xp, yp, rp, cs, er, nc, act, max_emit=max_emit, max_cols=max_cols
            )
        )(
            jnp.zeros_like(ypad[gi]), ypad[gi], r_panels[gi], meta["starts"][gi],
            meta["emit2d"][gi], meta["ncols_loc_d"][gi], meta["active_d"][gi],
        )
    if bss is not None:
        xs_u = _banded_solve_chunk_shared_static(
            ypad[1:e], r_panels[1:e], bss[0], bss[1], bss[2],
            meta["active_d"][1:e], max_cols=max_cols,
        )
    else:
        xs_u = _banded_solve_chunk_shared(
            ypad[1:e], r_panels[1:e], meta["s1u"], meta["eru"], meta["ncu"],
            meta["active_d"][1:e], max_emit=max_emit, max_cols=max_cols,
        )
    return jnp.concatenate([xs_g[:1], xs_u, xs_g[1:]], axis=0)


@functools.partial(jax.jit, static_argnames=("transpose",))
@highest_precision
def _batched_wy_cols(Y, T, Mt, transpose: bool):
    """Batched compact-WY apply on lane-major operands Mt [S, k, rows]."""
    Tt = T if transpose else jnp.swapaxes(T, 1, 2)
    return Mt + ((Mt @ Y) @ Tt) @ jnp.swapaxes(Y, 1, 2)


@functools.partial(jax.jit, static_argnames=("transpose", "out_rows"))
@highest_precision
def _batched_wy_soa(Y_soa, T_aos, w_soa, transpose: bool, out_rows=None):
    """Batched compact-WY apply with the batch axis in LANES.

    ``Y_soa`` [m, n, S] (the CAQR factors as stored), ``T_aos`` [S, n, n]
    (small, stored AoS), ``w_soa`` [m, k, S].  Computes
    ``w + Y (T or Tᵀ) (Yᵀ w)`` per lane-batch entry; with ``out_rows=r``
    only the first r output rows are formed (the fused solve feeds just the
    2o chain-space rows onward, so the m−2o pass-through rows of Y need only
    be READ for Yᵀw, never written back).  All contractions are
    broadcast-multiply + axis-sum — VPU elementwise over the lane axis, no
    dot_general relayout of the SoA operand.
    """
    T_soa = jnp.transpose(T_aos, (1, 2, 0))  # [n, n, S]
    u = jnp.sum(Y_soa[:, :, None, :] * w_soa[:, None, :, :], axis=0)  # [n,k,S]
    Tm = jnp.swapaxes(T_soa, 0, 1) if transpose else T_soa
    z = jnp.sum(Tm[:, :, None, :] * u[None, :, :, :], axis=1)  # [n,k,S]
    Yr = Y_soa if out_rows is None else Y_soa[:out_rows]
    wr = w_soa if out_rows is None else w_soa[:out_rows]
    return wr + jnp.sum(Yr[:, :, None, :] * z[None, :, :, :], axis=1)


@functools.partial(jax.jit, static_argnames=("h1", "transpose", "vec"))
@highest_precision
def _segment_apply(Yws, Ts, s1, s2, split, v_seg, h1: int, transpose: bool, vec: bool):
    """Per-segment two-segment compact-WY application, vmapped over segments.

    v_seg: [S, seg_rows(+pad)] or [S, seg_rows, k]."""
    if vec:
        v_seg = v_seg[..., None]
    S, rows, k = v_seg.shape

    def one(Y, T, a1, a2, sp, v):
        seq = TwoSegmentWYSeq(Y, T, a1, a2, sp, h1=h1, m=rows)
        return seq._apply(v, transpose)

    out = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0))(Yws, Ts, s1, s2, split, v_seg)
    return out[..., 0] if vec else out


@highest_precision
def _seg_qt_program(
    factors, meta, v2, *, S, R, nrows, m1, nbot, nbot2, rbot_max, o, h1
):
    """Whole Qᵀ·M as ONE traced program (the general-matrix QProduct of
    BandedBlockedSparseQR.h:552-585, segmented form).

    Phase-1 per-segment Qᵀ (block-diagonal over segments), reorder R-space
    rows first, then the compressed boundary reduction (blockdiag Qbᵀ +
    chain Qᵀ) on the bottom region.  ``factors``/``meta`` carry every device
    array as jit arguments; the statics are plan integers."""
    Yws = jnp.moveaxis(factors["Yws"], -1, 0)
    Ts = jnp.moveaxis(factors["Ts"], -1, 0)
    k = v2.shape[1]
    seg_gather, seg_valid = meta["seg_gather"], meta["seg_valid"]
    vs = jnp.where(
        seg_valid[..., None],
        v2[jnp.clip(seg_gather, 0, nrows - 1)],
        jnp.zeros((), v2.dtype),
    )  # [S, R, k]
    out = _segment_apply(
        Yws, Ts, meta["starts"], meta["rows2d"], meta["carry2d"],
        vs, h1, True, False,
    )
    flat = out.reshape(S * R, k)
    scatter = jnp.zeros((nrows, k), v2.dtype)
    scatter = scatter.at[seg_gather.reshape(-1)].set(flat, mode="drop")
    top = scatter[meta["row_order"]]
    # bottom region, SoA throughout ([rbot, k, S], matching the Yb store):
    # transposing Yb to AoS would materialize its lane-padded form
    vb = top[m1:]
    w = jnp.where(
        meta["rbot_valid_t"][:, None, :],
        jnp.moveaxis(vb[jnp.clip(meta["rbot_gather_t"], 0, nbot - 1)], 1, 2),
        jnp.zeros((), v2.dtype),
    )  # [rbot_max, k, S]
    w = _batched_wy_soa(factors["Yb"], factors["Tb"], w, True)
    z = factors["chain_seq"].apply_qt(
        jnp.moveaxis(w[: 2 * o], 2, 0).reshape(nbot2, k)
    )
    bout = jnp.zeros((nbot, k), v2.dtype).at[:nbot2].set(z)
    if rbot_max > 2 * o:
        bout = bout.at[meta["rest_pos"].reshape(-1)].set(
            jnp.moveaxis(w[2 * o :], 2, 0).reshape(-1, k), mode="drop"
        )
    return jnp.concatenate([top[:m1], bout], axis=0)


@highest_precision
def _seg_q_program(
    factors, meta, v2, *, S, R, nrows, m1, nbot, nbot2, rbot_max, o, h1
):
    """Inverse of :func:`_seg_qt_program`: chain Q + blockdiag Qb on the
    bottom region, then the per-segment Q in natural row order."""
    k = v2.shape[1]
    vb = v2[m1:]
    z = factors["chain_seq"].apply_q(vb[:nbot2]).reshape(S, 2 * o, k)
    if rbot_max > 2 * o:
        rest = jnp.where(
            (meta["rest_pos"] < nbot)[..., None],
            vb[jnp.clip(meta["rest_pos"], 0, nbot - 1)],
            jnp.zeros((), v2.dtype),
        )
        w = jnp.concatenate([z, rest], axis=1)
    else:
        w = z
    w = _batched_wy_soa(factors["Yb"], factors["Tb"], jnp.moveaxis(w, 0, 2), False)
    bout = jnp.zeros((nbot, k), v2.dtype)
    bout = bout.at[meta["rbot_gather"].reshape(-1)].set(
        jnp.moveaxis(w, 2, 0).reshape(-1, k), mode="drop"
    )
    full = jnp.concatenate([v2[:m1], bout], axis=0)
    nat = full[meta["row_order_inv"]]
    vs = jnp.where(
        meta["seg_valid"][..., None],
        nat[jnp.clip(meta["seg_gather"], 0, nrows - 1)],
        jnp.zeros((), v2.dtype),
    )
    out = _segment_apply(
        jnp.moveaxis(factors["Yws"], -1, 0), jnp.moveaxis(factors["Ts"], -1, 0),
        meta["starts"], meta["rows2d"], meta["carry2d"],
        vs, h1, False, False,
    )
    flat = out.reshape(S * R, k)
    scatter = jnp.zeros((nrows, k), v2.dtype)
    return scatter.at[meta["seg_gather"].reshape(-1)].set(flat, mode="drop")


class SegmentedBandedQR(QRSolver):
    """Banded QR with segment-parallel factorization (drop-in for
    :class:`BandedBlockedQR` on uniform chains; falls back to it otherwise).

    ``segment_blocks`` controls L (blocks per segment).  Requires a uniform
    plan (equal block shapes/steps after merging, the common case for banded
    Jacobians); with ``fallback=True`` (default) non-uniform/short plans
    delegate to a plain :class:`BandedBlockedQR`; with ``fallback=False``
    they raise instead.
    """

    DEFAULT_SEGMENT_BLOCKS = 32  # L; segmentation needs >= 2L blocks

    def __init__(
        self,
        suggested_block_cols: int = 8,
        segment_blocks: int = DEFAULT_SEGMENT_BLOCKS,
        block_rows: Optional[int] = None,
        block_cols: Optional[int] = None,
        block_overlap: Optional[int] = None,
        fallback: bool = True,
        mesh=None,
        axis: str = "dp",
        use_pallas="auto",
    ):
        self._suggested = suggested_block_cols
        self.L = segment_blocks
        self._static = (
            block_rows is not None and block_cols is not None and block_overlap is not None
        )
        self._brows, self._bcols, self._boverlap = block_rows, block_cols, block_overlap
        self._fallback = fallback
        # phase-1 kernel tier: "auto" uses the fused Pallas segment-chain
        # kernel (ops/pallas_banded.py) on TPU/fp32 uniform chains; True
        # forces it (raises if the plan geometry is unsupported); False keeps
        # the XLA scan.  ``_pallas_interpret`` (tests) runs the kernel in
        # interpreter mode so the path is exercised on the CPU mesh.
        self.use_pallas = use_pallas
        self._pallas_interpret = False
        # distribution: shard the segment axis of every per-segment factor
        # over ``mesh``'s ``axis`` after each compute() — the banded family's
        # multi-chip story (phase 1 partitions with zero communication; only
        # the tiny boundary chain is sequential and stays replicated)
        self.mesh = mesh
        self.axis = axis
        self._delegate = None
        self._analysis_ok = False

    # --- shape ----------------------------------------------------------------------
    @property
    def rows(self) -> int:
        return self._nrows

    @property
    def cols(self) -> int:
        return self._ncols

    # --- analysis -------------------------------------------------------------------
    def analyze_pattern(self, mat: SparseCSR):
        """Segmented analysis; on a non-segmentable plan either delegates to a
        plain :class:`BandedBlockedQR` (``fallback=True``) or raises."""
        self._delegate = None
        self.plan = None
        try:
            return self._analyze_pattern_segmented(mat)
        except ValueError:
            if not self._fallback:
                raise
            from .banded_blocked import BandedBlockedQR

            self._delegate = BandedBlockedQR(
                self._brows, self._bcols, self._boverlap, self._suggested
            )
            if self.plan is not None:
                # segmentation failed AFTER pattern analysis succeeded: hand
                # the plan/row-perm over instead of re-running the O(nnz)
                # ordering + block detection in the delegate
                self._delegate.set_analysis(self.plan, self._row_perm)
            else:
                self._delegate.analyze_pattern(mat)
            self._nrows, self._ncols = mat.shape
            self._analysis_ok = True
            return self

    def set_analysis(self, plan, row_perm: Optional[Permutation] = None):
        """Install a precomputed plan (auto_qr / persist.load_analysis) —
        segment without re-running the O(nnz) ordering + block detection.
        Falls back to a plain delegate like :meth:`analyze_pattern`."""
        self._delegate = None
        self.plan = plan
        self._row_perm = (
            row_perm if row_perm is not None else Permutation.identity(plan.nrows)
        )
        try:
            return self._segment_plan()
        except ValueError:
            if not self._fallback:
                raise
            from .banded_blocked import BandedBlockedQR

            self._delegate = BandedBlockedQR(
                self._brows, self._bcols, self._boverlap, self._suggested
            )
            self._delegate.set_analysis(plan, self._row_perm)
            self._nrows, self._ncols = plan.nrows, plan.ncols
            self._analysis_ok = True
            return self

    def _analyze_pattern_segmented(self, mat: SparseCSR):
        self._nrows, self._ncols = mat.shape
        if self._static:
            self._row_perm = Permutation.identity(mat.nrows)
            self.plan = from_block_banded_pattern(
                mat.nrows, mat.ncols, self._brows, self._bcols, self._boverlap,
                self._suggested,
            )
        else:
            self._row_perm, has_perm = as_banded_as_possible(mat)
            sorted_mat = mat.permute_rows(self._row_perm) if has_perm else mat
            self.plan = block_banded_info(sorted_mat, self._suggested)
        return self._segment_plan()

    def _segment_plan(self):
        """Segmentation bookkeeping for an installed ``self.plan``."""
        self._nrows, self._ncols = self.plan.nrows, self.plan.ncols
        p = self.plan
        nb = p.num_blocks
        if nb < 2 * self.L:
            raise ValueError("chain too short for segmentation; use BandedBlockedQR")
        b0 = p.blocks[0]
        body = p.blocks[1:-1]
        if not all(b.nrows == b0.nrows and b.ncols == b0.ncols for b in body):
            raise ValueError("non-uniform plan; use BandedBlockedQR")
        g = banded_geometry(p)
        step = int(g["col_inc"][0])
        if not np.all(g["col_inc"][:-1] == step):
            raise ValueError("non-uniform column step; use BandedBlockedQR")
        self._overlap = b0.ncols - step
        if self._overlap <= 0:
            raise ValueError("no overlap: use BlockDiagonalQR for this structure")
        if self._overlap > step:
            raise ValueError("overlap exceeds column step; use BandedBlockedQR")
        self.geom = g
        # invalidate lazy per-plan caches before rebuilding
        for attr in (
            "_seg_gather", "_col_gather", "_fac_fn", "_solve_fn",
            "_apply_fns", "_solve_mat_fn",
        ):
            if hasattr(self, attr):
                delattr(self, attr)
        self._panel_gmap = None
        self._slab_gmap = None
        self._panel_fast = None
        self._slab_fast = None
        self._prepare_segmentation()
        self._analysis_ok = True
        return self

    # --- factorization --------------------------------------------------------------
    def _prepare_segmentation(self):
        """Pattern-only segmentation bookkeeping, run ONCE per plan.

        Everything here (segment spans, per-segment local plans/geometry,
        panel descriptor list, device-resident metadata, the P_split column
        permutation) depends only on the sparsity plan — recomputing it every
        factorize made repeated computes host-bound (the LM pattern:
        analyzePattern once, factorize per iteration)."""
        p, g = self.plan, self.geom
        nb, L = p.num_blocks, self.L
        o = self._overlap
        S = -(-nb // L)
        self.S = S
        rows_, cols_, nrows_, ncols_ = p.as_arrays()

        # --- segment row/column spans (host) --------------------------------------
        seg_first = [s * L for s in range(S)]
        seg_last = [min((s + 1) * L, nb) - 1 for s in range(S)]
        seg_row0 = [int(rows_[f]) for f in seg_first]
        seg_row1 = [
            int(rows_[l] + nrows_[l]) if l == nb - 1 else int(rows_[seg_first[s + 1]])
            for s, l in enumerate(seg_last)
        ]
        self._seg_rows = [r1 - r0 for r0, r1 in zip(seg_row0, seg_row1)]
        self._seg_row0 = seg_row0
        max_seg_rows = max(self._seg_rows)

        # boundary columns: first o cols of segments 1..S-1
        bcols = []
        for s in range(1, S):
            c0 = int(cols_[seg_first[s]])
            bcols.extend(range(c0, c0 + o))
        self._bcols_idx = np.asarray(bcols, dtype=np.int64)
        interior_mask = np.ones(self._ncols, dtype=bool)
        interior_mask[self._bcols_idx] = False
        self._icols_idx = np.nonzero(interior_mask)[0]
        self._m1 = int(self._icols_idx.size)  # total interior columns
        self._m2 = int(self._bcols_idx.size)

        # per-segment interior column counts and local offsets
        self._seg_ncols = []
        for s in range(S):
            f, l = seg_first[s], seg_last[s]
            c_end = int(cols_[l] + ncols_[l]) - o if l < nb - 1 else self._ncols
            c_begin = int(cols_[f]) + (o if s > 0 else 0)
            self._seg_ncols.append(c_end - c_begin)
        self._seg_col0 = np.concatenate([[0], np.cumsum(self._seg_ncols)])[:-1]

        # --- per-segment local plans + geometry (host) -----------------------------
        # Each segment is a standalone banded chain over its interior columns:
        # the leading o columns of segments 1.. and the trailing o columns of
        # segments ..S-2 are boundary (right-block) columns and are excluded.
        from ..plan import BlockInfo as _BI, StructurePlan as _SP

        mR = int(nrows_.max())
        seg_geoms = []
        seg_plans = []
        for s_i in range(S):
            f, l = seg_first[s_i], seg_last[s_i]
            colbase = int(cols_[f]) + (o if s_i > 0 else 0)
            blocks_s = []
            for i in range(f, l + 1):
                drop_lead = o if (s_i > 0 and i == f) else 0
                drop_tail = o if (s_i < S - 1 and i == l) else 0
                blocks_s.append(
                    _BI(
                        int(rows_[i]) - seg_row0[s_i],
                        int(cols_[i]) + drop_lead - colbase,
                        int(nrows_[i]),
                        int(ncols_[i]) - drop_lead - drop_tail,
                    )
                )
            plan_s = _SP(self._seg_rows[s_i], self._seg_ncols[s_i], tuple(blocks_s))
            seg_plans.append(plan_s)
            seg_geoms.append(banded_geometry(plan_s))

        # stacked [S, L] geometry (padded steps inactive)
        loc_geom = {
            k: np.zeros((S, L), dtype=np.int64)
            for k in ("carry_rows", "col_inc", "ncols", "nrows", "cols", "rows")
        }
        active = np.zeros((S, L), dtype=bool)
        emit = np.zeros((S, L), dtype=np.int64)
        max_cols = 1
        for s_i in range(S):
            gs = seg_geoms[s_i]
            nsteps = seg_last[s_i] - seg_first[s_i] + 1
            active[s_i, :nsteps] = True
            emit[s_i, :nsteps] = gs["emit_rows"]
            for k in loc_geom:
                loc_geom[k][s_i, :nsteps] = gs[k if k != "cols" else "cols"]
            max_cols = max(max_cols, int(gs["ncols"].max()))
        self._emit = emit

        # dense-panel descriptor list (rows local to segment, cols local to
        # block) — consumed by one native extraction call per factorize
        block_list = []
        for s_i in range(S):
            colbase = int(cols_[seg_first[s_i]]) + (o if s_i > 0 else 0)
            blocks_s = list(seg_plans[s_i].blocks)
            for j in range(L):
                if j < len(blocks_s):
                    b = blocks_s[j]
                    block_list.append(
                        (seg_row0[s_i] + b.row, colbase + b.col, b.nrows, b.ncols)
                    )
                else:
                    block_list.append((0, 0, 0, 0))
        self._block_list = block_list
        self._mRloc = mR

        self._kw = dict(
            max_active=max(int(g_s["active"].max()) for g_s in seg_geoms),
            max_cols=max_cols,
            max_carry=max(max(int(g_s["carry_rows"].max()) for g_s in seg_geoms), 1),
            max_emit=int(emit.max()),
        )
        self._max_cols = max_cols
        self._max_emit = self._kw["max_emit"]
        self._max_seg_rows = max_seg_rows
        self._loc_geom = loc_geom
        self._active = active
        # device-resident static metadata (transferred once per plan)
        self._starts = jnp.asarray(loc_geom["cols"], dtype=jnp.int32)
        self._carry_d = jnp.asarray(loc_geom["carry_rows"].reshape(-1), dtype=jnp.int32)
        self._carry2d = jnp.asarray(loc_geom["carry_rows"], dtype=jnp.int32)
        self._nrows_d = jnp.asarray(loc_geom["nrows"].reshape(-1), dtype=jnp.int32)
        self._colinc_d = jnp.asarray(loc_geom["col_inc"], dtype=jnp.int32)
        self._ncols_d = jnp.asarray(loc_geom["ncols"], dtype=jnp.int32)
        self._rows2d = jnp.asarray(loc_geom["rows"], dtype=jnp.int32)
        self._active_d = jnp.asarray(active)
        self._emit_d = jnp.asarray(emit, dtype=jnp.int32)
        self._seg_col0_d = jnp.asarray(self._seg_col0)

        # column permutation: P_split (interior-first) — A · P = Q · R
        self._cols_perm = Permutation(
            np.concatenate([self._icols_idx, self._bcols_idx])
        )

        # --- boundary chain (phase-3 structure) -------------------------------------
        # Segment s's bottom rows are nonzero only in boundary columns
        # [(s-1)o, (s+1)o); stacked in segment order they form a banded chain
        # of S blocks stepping o columns.  Block 0 (trailing boundary only)
        # and block S-1 (leading only) are o wide; interior blocks 2o.
        nloc_max = max(self._seg_ncols)
        self._nloc_max = nloc_max
        rbot = [self._seg_rows[si] - self._seg_ncols[si] for si in range(S)]
        if min(rbot) < 2 * o:
            raise ValueError(
                "segment bottom rows too few for the boundary chain; use BandedBlockedQR"
            )
        self._rbot = rbot
        rbot_max = max(rbot)
        self._rbot_max = rbot_max
        cum = np.concatenate([[0], np.cumsum(rbot)])
        self._nbot = int(cum[-1])
        # CAQR-style compression: each segment's [rbot, 2o] bottom slab is
        # first reduced by ONE vmapped QR to its [2o, 2o] R factor, and the
        # recursive boundary chain runs over those tiny factors — S sequential
        # steps on [3o, 2o]-ish panels instead of [rbot + o, 2o] ones, and the
        # per-segment reduction is batch-parallel (and shard-parallel across
        # chips).  Q composes as blockdiag(Qb_s) · Q_chain.
        self._nbot2 = S * 2 * o
        chain_blocks = []
        for si in range(S):
            c0b = max(0, si - 1) * o
            ncb = min(2 * o, self._m2 - c0b) if 0 < si < S - 1 else o
            chain_blocks.append(_BI(si * 2 * o, int(c0b), 2 * o, int(ncb)))
        # Re-block the chain into groups of G consecutive factors.  The scan
        # over the compressed chain is per-step-latency-bound (625 steps of
        # [3o, 2o] panels ran ~23 ms factorize + two ~equal solve scans at
        # 20k blocks); G-fold grouping cuts the step count G-fold — and the
        # total reflector count too, since only one o-column carry overlap is
        # refactorized per GROUP instead of per block.  G is capped so the
        # grouped panel stays on the unrolled panel-QR path ((G+1)·o ≤ 32
        # columns), and grouping only engages on long chains.
        G = 1
        if S >= 24:
            G = max(1, min(32 // o - 1, S // 8))
        self._chain_group = G
        if G > 1:
            gblocks = []
            for g0 in range(0, S, G):
                blks = chain_blocks[g0 : g0 + G]
                c0g = min(b.col for b in blks)
                c1g = max(b.col + b.ncols for b in blks)
                gblocks.append(
                    _BI(blks[0].row, c0g, sum(b.nrows for b in blks), c1g - c0g)
                )
            Sg = len(gblocks)
            mrg = max(b.nrows for b in gblocks)
            mcg = max(b.ncols for b in gblocks)
            # map scattering comp's [S, 2o, 2o] entries into grouped panels
            # (sentinel = index of the appended zero)
            rmap = np.full((Sg, mrg, mcg), S * 4 * o * o, dtype=np.int64)
            for g0 in range(0, S, G):
                g = g0 // G
                gb = gblocks[g]
                for i, b in enumerate(chain_blocks[g0 : g0 + G]):
                    r0 = b.row - gb.row
                    c0 = b.col - gb.col
                    idx = (
                        (g0 + i) * 4 * o * o
                        + np.arange(2 * o)[:, None] * 2 * o
                        + np.arange(b.ncols)[None, :]
                    )
                    rmap[g, r0 : r0 + 2 * o, c0 : c0 + b.ncols] = idx
            self._chain_regroup = jnp.asarray(rmap)
            chain_plan = _SP(self._nbot2, self._m2, tuple(gblocks))
        else:
            self._chain_regroup = None
            chain_plan = _SP(self._nbot2, self._m2, tuple(chain_blocks))
        cg = banded_geometry(chain_plan)
        self._chain_geom = cg
        self._chain_geom_dev = {
            k: jnp.asarray(cg[k])
            for k in ("carry_rows", "col_inc", "nrows", "cols", "rows")
        }
        self._chain_kw = dict(
            max_active=int(cg["active"].max()),
            max_cols=int(cg["ncols"].max()),
            max_carry=max(int(cg["carry_rows"].max()), 1),
            max_emit=int(cg["emit_rows"].max()),
        )
        self._chain_solve_meta = (
            jnp.asarray(cg["cols"]),
            jnp.asarray(cg["emit_rows"]),
            jnp.asarray(cg["ncols"]),
        )
        # fused sequential-chain kernel gate + gather map: the scan over the
        # compressed chain is per-step-dispatch-bound (~10 ms of the 20k-block
        # factorize at 90 grouped steps); pallas_chain_qr runs the WHOLE chain
        # in one launch with the carry in VMEM.  The kernel wants uniform
        # carry depth after step 0 and one column increment (the last step's
        # carry cut is dead), and panels pre-shifted in X-layout — the shift
        # and transpose fold into this host-built gather map over comp's
        # flattened [S, 2o, 2o] entries (sentinel = appended zero).
        self._chain_pallas = None
        nbc = len(chain_plan.blocks)
        crs, cis = cg["carry_rows"], cg["col_inc"]
        mcac = max(int(crs.max()), 1)
        mcc = int(cg["ncols"].max())
        mac = int(cg["active"].max())
        mec = int(cg["emit_rows"].max())
        ciu = int(cis[1]) if nbc >= 3 else int(cis[0])
        if (
            nbc >= 8
            and mcc <= 32
            and crs[0] == 0
            and (cis[1 : nbc - 1] == ciu).all()
        ):
            # nbc >= 8: even a 12-step grouped chain costs ~216 µs/step in
            # the scan (profiled on the config-3 plan: 2.6 ms for 12 steps of
            # the unrolled 32-column body) — a single kernel launch is far
            # under that at any step count the segmented gate admits
            nsub = 8
            nbp = -(-nbc // nsub) * nsub
            sent = S * 4 * o * o
            rmt = np.full((nbp, mcc, mac), sent, dtype=np.int64)
            groups = (
                [chain_blocks[g0 : g0 + G] for g0 in range(0, S, G)]
                if G > 1
                else [[b] for b in chain_blocks]
            )
            for g, blks in enumerate(groups):
                c0g = min(b.col for b in blks)
                r0g = blks[0].row
                cr_g = int(crs[g])
                for i, b in enumerate(blks):
                    si = b.row // (2 * o)
                    rr = np.arange(2 * o)[None, :]
                    cc = np.arange(b.ncols)[:, None]
                    rmt[
                        g,
                        (b.col - c0g) + cc,
                        cr_g + (b.row - r0g) + rr,
                    ] = si * 4 * o * o + rr * 2 * o + cc
            actc = np.zeros((nbp,), np.float32)
            actc[:nbc] = 1.0
            self._chain_pallas = dict(
                map=_imap(rmt),
                act=jnp.asarray(actc),
                nb=nbc,
                statics=dict(ma=mac, mc=mcc, mca=mcac, me=mec,
                             ci=ciu, ci0=int(cis[0]), nsub=nsub),
            )

        # device gather maps between padded segment rows and the chain layout
        seg_ncols_a = np.asarray(self._seg_ncols)
        self._top_valid = jnp.asarray(
            np.arange(nloc_max)[None, :] < seg_ncols_a[:, None]
        )
        # each segment's bottom rows are the contiguous run starting right
        # after its local columns — the factorize cuts them with one batched
        # dynamic_slice (element gathers are ~150M elem/s on TPU)
        self._bot_starts = _imap(np.minimum(seg_ncols_a, max_seg_rows))
        self._bot_valid = jnp.asarray(
            np.arange(rbot_max)[None, :] < np.asarray(rbot)[:, None]
        )
        # x2 window per segment: x2seg[s, j] = x2[(s-1)o + j] (zero out of range)
        self._x2_idx = _imap(
            np.arange(S)[:, None] * o + np.arange(2 * o)[None, :]
        )
        self._seg_row0_arr = np.asarray(self._seg_row0)

        # bottom-region maps for the compressed (CAQR) boundary reduction:
        # the [nbot] bottom vector (segment-major rbot[s] rows each) maps to a
        # padded [S, rbot_max] batch for the vmapped Qb applies; after Qbᵀ the
        # leading 2o rows of each segment feed the chain (positions [0, S·2o)
        # of the output) and the remaining rows pass through behind them.
        rg = np.full((S, rbot_max), self._nbot, dtype=np.int64)
        for s in range(S):
            rg[s, : rbot[s]] = int(cum[s]) + np.arange(rbot[s])
        rest_w = max(rbot_max - 2 * o, 1)
        cum_rest = np.concatenate([[0], np.cumsum([r - 2 * o for r in rbot])])
        rp = np.full((S, rest_w), self._nbot, dtype=np.int64)
        for s in range(S):
            n = rbot[s] - 2 * o
            rp[s, :n] = self._nbot2 + int(cum_rest[s]) + np.arange(n)
        self._rbot_gather = _imap(rg)
        self._rbot_valid = jnp.asarray(rg < self._nbot)
        # lane-major twins for the fused solve's SoA bottom apply
        # (rows in sublanes, segments in lanes — matches the SoA Yb store)
        self._rbot_gather_t = _imap(rg.T)
        self._rbot_valid_t = jnp.asarray(np.ascontiguousarray((rg < self._nbot).T))
        self._rest_pos = _imap(rp)
        self._prepare_pallas_gate()
        self._prepare_p2_gate()

    def _prepare_p2_gate(self):
        """Gate + scalars for the shared-window phase-2 batch apply
        (:func:`_segment_apply_cols_shared`): segments 1.. must share one
        s1/s2/split sequence on their active prefixes (interior segments of a
        uniform chain do; the padded tail's inactive steps are no-ops), and
        the composed-window slice needs ``split <= s2`` everywhere."""
        S, L = self.S, self.L
        lg, act = self._loc_geom, self._active
        nuni = 0
        if S >= 2:
            s1u = lg["cols"][1].astype(np.int32)
            s2u = lg["rows"][1].astype(np.int32)
            spu = lg["carry_rows"][1].astype(np.int32)
            if bool((s2u >= spu).all()):
                # maximal run of segments (from 1) matching the shared
                # scalars on their active prefixes; an irregular tail (the
                # final chain block carries no trailing overlap) stays on
                # the general per-segment path
                for s in range(1, S):
                    n = int(act[s].sum())
                    if (
                        bool((lg["cols"][s][:n] == s1u[:n]).all())
                        and bool((lg["rows"][s][:n] == s2u[:n]).all())
                        and bool((lg["carry_rows"][s][:n] == spu[:n]).all())
                    ):
                        nuni += 1
                    else:
                        break
        self._p2_nuni = nuni if nuni >= 2 else 0
        self._p2_uniform = self._p2_nuni > 0
        self._bs_uniform = False
        if self._p2_uniform:
            self._s1u = jnp.asarray(s1u)
            self._s2u = jnp.asarray(s2u)
            self._spu = jnp.asarray(spu)
            # host tuples select the unrolled-static uniform apply (the
            # scalars are plan constants; static slices let XLA update the
            # phase-2 work buffer in place instead of re-materializing it
            # per scan step)
            self._p2_static = (
                tuple(int(x) for x in s1u),
                tuple(int(x) for x in s2u),
                tuple(int(x) for x in spu),
                _p2_stream_plan(
                    s1u, s2u, spu, int(self._kw["max_active"]), self.L,
                    int(self._max_seg_rows),
                ),
            )
            # per-segment scalar tuples for the general (irregular) segments,
            # trimmed to active steps, enabling their unrolled-static stream
            A_ = int(self._kw["max_active"])
            R_ = int(self._max_seg_rows)
            gen = []
            for s in [0] + list(range(1 + self._p2_nuni, S)):
                n = int(act[s].sum())
                g = (
                    tuple(int(x) for x in lg["cols"][s][:n]),
                    tuple(int(x) for x in lg["rows"][s][:n]),
                    tuple(int(x) for x in lg["carry_rows"][s][:n]),
                )
                if _p2_stream_plan(g[0], g[1], g[2], A_, n, R_) is None:
                    gen = None
                    break
                gen.append(g)
            self._p2_gen_static = tuple(gen) if gen is not None else None
            # back-substitution gate: its shared run additionally needs the
            # (emit-rows, ncols) sequences equal on active prefixes — the
            # FINAL segment usually breaks this (its last chain block has no
            # trailing overlap, so it emits all its columns), so the run
            # length is tracked separately from nuni; the unrolled
            # triangular solve is bounded to <=16 emit rows
            em, ncl = self._emit, lg["ncols"]
            eru = em[1].astype(np.int32)
            ncu = ncl[1].astype(np.int32)
            bs_nuni = 0
            if self._kw["max_emit"] <= 16:
                for s in range(1, 1 + self._p2_nuni):
                    n = int(act[s].sum())
                    if np.array_equal(em[s][:n], eru[:n]) and np.array_equal(
                        ncl[s][:n], ncu[:n]
                    ):
                        bs_nuni += 1
                    else:
                        break
            self._bs_nuni = bs_nuni if bs_nuni >= 2 else 0
            self._bs_uniform = self._bs_nuni > 0
            if self._bs_uniform:
                self._eru = jnp.asarray(eru)
                self._ncu = jnp.asarray(ncu)
                # host tuples select the unrolled-static back-substitution
                # (static slices + only-er-rows triangular unroll; the scan
                # form pays ~27 µs/step of step latency)
                self._bs_static = (
                    tuple(int(x) for x in s1u),
                    tuple(int(x) for x in eru),
                    tuple(int(x) for x in ncu),
                )
                self._bs_gen_static = tuple(
                    (
                        tuple(int(x) for x in lg["cols"][s][: int(act[s].sum())]),
                        tuple(int(x) for x in em[s][: int(act[s].sum())]),
                        tuple(int(x) for x in ncl[s][: int(act[s].sum())]),
                    )
                    for s in [0] + list(range(1 + self._bs_nuni, S))
                )

    def _prepare_pallas_gate(self):
        """Decide whether the fused Pallas segment-chain kernel can run phase 1
        for this plan (ops/pallas_banded.py) and precompute its static
        geometry.  Requirements beyond the solver's own uniformity checks:
        a single carry depth after step 0 (so the panel shift is static per
        step), one body column increment with at most a distinct first-step
        increment on segments 1.. (the dropped leading overlap), and panel
        tiles small enough for VMEM / a bounded unrolled kernel."""
        S, L = self.S, self.L
        lg, act = self._loc_geom, self._active
        kw = self._kw
        ma, mc = kw["max_active"], kw["max_cols"]
        mca, me = kw["max_carry"], kw["max_emit"]
        ns = act.sum(axis=1)
        cr, ci_a = lg["carry_rows"], lg["col_inc"]
        ok = mc <= 16 and ma * mc <= 512
        # double-buffered in/out tiles + carry scratch, one (8,128) fp32 tile
        # per panel entry
        vmem = (2 * (2 * ma * mc + mc + me * mc) + mca * mc) * 8 * 128 * 4
        ok = ok and vmem < 12 * 2**20
        # the per-step panel shift (carry_rows[s, l], including the shallower
        # final-block carry) is applied on-device by the same _shift_panels
        # gather the XLA path uses, so only the carry *extraction* increment
        # must be static: one body value, with at most a distinct first-step
        # value on segments 1.. (their dropped leading overlap).  The final
        # step's increment is never consumed (the carry resets at l == 0).
        ci_body = int(ci_a[0, 0]) if ns[0] >= 2 else 0
        ci0_rest = int(ci_a[1, 0]) if S > 1 and ns[1] >= 2 else ci_body
        for s in range(S):
            n = int(ns[s])
            if n >= 2:
                first = ci_body if s == 0 else ci0_rest
                ok = ok and int(ci_a[s, 0]) == first
                ok = ok and bool((ci_a[s, 1 : n - 1] == ci_body).all())
        ok = ok and 0 <= ci_body <= mc and 0 <= ci0_rest <= mc
        self._pallas_gate = bool(ok)
        self._pallas_ci = (ci_body, ci0_rest)
        if ok:
            from ..ops.pallas_banded import seg_pad

            npad = seg_pad(S)
            self._pallas_npad = npad
            act_soa = np.zeros((L, 1, npad), np.float32)
            act_soa[:, 0, :S] = act.T
            self._act_soa = jnp.asarray(act_soa)

    def _pallas_active(self) -> bool:
        if self.use_pallas is False:
            return False
        if self.use_pallas is True:
            if not self._pallas_gate:
                raise ValueError(
                    "use_pallas=True but the plan geometry is not supported "
                    "by the Pallas segment-chain kernel (non-uniform carry/"
                    "column step or panel too large); use use_pallas='auto'"
                )
            return True
        if not self._pallas_gate:
            return False
        if self._pallas_interpret:
            return True
        return (
            jax.default_backend() == "tpu" and not jax.config.jax_enable_x64
        )

    def compute(self, mat: SparseCSR, force_pattern_analysis: bool = False):
        if not self._analysis_ok or force_pattern_analysis:
            self.analyze_pattern(mat)
        if self._delegate is not None:
            self._delegate.compute(mat)
            self._info = self._delegate._info
            self._health = self._delegate._health
            return self
        S, L = self.S, self.L
        pmat = (
            mat.permute_rows(self._row_perm)
            if not self._row_perm.is_identity()
            else mat
        )
        mR, max_cols = self._mRloc, self._max_cols

        # pattern-only gather maps, built once per plan and kept on device:
        # interior panels [S*L, mR, max_cols] and boundary slabs A_B
        # [S, seg_rows(pad), 2o] (a segment's rows touch only its own two
        # adjacent boundary-column groups) both extract from the raw data
        # vector with a single device gather — per factorize, ONLY that
        # contiguous vector crosses the host->device tunnel
        o = self._overlap
        pallas_on = self._pallas_active()
        fp = pmat.pattern_fingerprint()
        if self._slab_gmap is None or fp != getattr(self, "_gmap_fp", None):
            # keyed on the stored-nonzero LAYOUT, not just the plan — see
            # BandedBlockedQR.compute
            self._gmap_fp = fp
            self._fac_fn = None  # extraction strategy is baked in statically
            # device-resident value path (factorize_values): pattern-only row
            # permutation of the VALUE vector + expected nnz
            self._vals_nnz = mat.nnz
            self._data_perm = (
                None
                if self._row_perm.is_identity()
                else jnp.asarray(
                    mat.row_perm_data_map(self._row_perm).astype(
                        np.int32 if mat.nnz < 2**31 else np.int64
                    )
                )
            )
            gm = pmat.panels_gather_map(self._block_list, mR, max_cols)
            # XLA's TPU element gather runs at ~150M elem/s — 29 ms for the
            # 4.2M-entry panel map at 20k blocks, the single largest stage of
            # the factorize.  On row-sorted banded layouts every panel's
            # stored entries are ONE contiguous data run at the panel's own
            # linear offset (delta 0), except the leading-overlap-dropping
            # first panel of segments 1.., whose run is shifted by one shared
            # delta.  Detect that on the host (once per layout) and extract
            # with a reshape + boolean mask + one static slice instead of the
            # gather — measured reshape path: 0.6 ms for the same bytes.
            self._panel_fast = self._detect_panel_fast(gm, pmat.nnz)
            self._panel_gmap = None if self._panel_fast else _imap(gm)
            col_pos = np.full(self._ncols, -1, dtype=np.int64)
            col_pos[self._bcols_idx] = np.arange(self._m2)
            row_ids = np.repeat(np.arange(self._nrows), np.diff(pmat.indptr))
            bp = col_pos[pmat.indices]
            sel = bp >= 0
            r_s = row_ids[sel]
            b_s = bp[sel]
            seg_of = np.searchsorted(self._seg_row0_arr, r_s, side="right") - 1
            seam = b_s // o + 1  # boundary group g sits between segments g and g+1
            lead = seg_of == seam
            ok = lead | (seg_of == seam - 1)  # non-adjacent rows cannot occur
            slabcol = np.where(lead, b_s % o, o + b_s % o)
            gdt = np.int32 if pmat.nnz + 1 < 2**31 else np.int64
            gm = np.full((S, self._max_seg_rows, 2 * o), pmat.nnz, dtype=gdt)
            gm[
                seg_of[ok], (r_s - self._seg_row0_arr[seg_of])[ok], slabcol[ok]
            ] = np.nonzero(sel)[0][ok]
            # lane-major map: gathering through the transposed map yields the
            # slab directly as [S, 2o, seg_rows] — the long axis in TPU lanes
            # (a [seg_rows, 2o] layout pads the 2o minor dim 16× to 128).
            # Only the transposed form goes to the device; the row-major gm
            # stays host-side (the built-flag keeps a cheap sentinel).
            # Boundary columns are touched only by rows NEAR the seams (the
            # first/last blocks of each segment), so ~97% of the map is
            # sentinel; gather just two w-row edge windows and assemble the
            # interior as literal zeros — the full-map element gather was
            # 22 ms at 20k blocks, the windows ~1.5 ms.
            self._slab_gmap = True
            valid_row = (gm < pmat.nnz).any(axis=2)  # [S, seg_rows]
            Rr = self._max_seg_rows
            ridx = np.arange(Rr)[None, :]
            dist = np.where(valid_row, np.minimum(ridx + 1, Rr - ridx), 0)
            w = int(dist.max()) if valid_row.any() else 0
            if 0 < 2 * w <= Rr // 2:
                self._slab_fast = dict(
                    w=w,
                    lead_t=_imap(gm[:, :w, :].transpose(0, 2, 1)),
                    tail_t=_imap(gm[:, Rr - w :, :].transpose(0, 2, 1)),
                )
                self._slab_gmap_t = None
            else:
                self._slab_fast = None
                self._slab_gmap_t = _imap(gm.transpose(0, 2, 1))

        # --- device gather + phases 1-3 as ONE jitted dispatch ----------------------
        # eager glue between the jitted stages cost ~40 per-primitive dispatch
        # round trips through the accelerator tunnel per factorize; the whole
        # pipeline is fused into one per-plan compiled program instead
        dtype = np.float32 if not jax.config.jax_enable_x64 else np.float64
        fac = self._get_factorize_fn(pallas_on)
        (self._Yws, self._Ts, self._r_panels, self._j2_top,
         self._Yb, self._Tb, self._chain_seq, self._chain_r, health) = fac(
            jnp.asarray(np.asarray(pmat.data, dtype)), self._fac_meta
        )
        if self.mesh is not None:
            self._place_on_mesh()

        self._set_success(health)
        return self

    def factorize_values(self, values) -> "SegmentedBandedQR":
        """Refactorize from a vector of stored-nonzero VALUES (device-resident
        fast path) — see :meth:`BandedBlockedQR.factorize_values`.  ``values``
        must be in the analyzed matrix's stored order (``mat.data``, length
        ``mat.nnz``); a jax array already on device refactorizes with zero
        host work and zero host→device traffic."""
        if self._delegate is not None:
            self._delegate.factorize_values(values)
            self._info = self._delegate._info
            self._health = self._delegate._health
            return self
        if not self._analysis_ok or self._slab_gmap is None:
            raise ValueError(
                "factorize_values requires a prior compute() on a matrix "
                "with this stored-nonzero layout"
            )
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        vals = jnp.asarray(values)
        if vals.ndim != 1 or vals.shape[0] != self._vals_nnz:
            raise ValueError(
                f"values must be [{self._vals_nnz}] (the analyzed matrix's "
                f"stored-nonzero count), got {vals.shape}"
            )
        if vals.dtype != dtype:
            vals = vals.astype(dtype)
        if self._data_perm is not None:
            vals = vals[self._data_perm]
        fac = self._get_factorize_fn(self._pallas_active())
        (self._Yws, self._Ts, self._r_panels, self._j2_top,
         self._Yb, self._Tb, self._chain_seq, self._chain_r, health) = fac(
            vals, self._fac_meta
        )
        if self.mesh is not None:
            self._place_on_mesh()
        self._set_success(health)
        return self

    def _place_on_mesh(self):
        """Shard every per-segment factor over the mesh's segment axis.

        The vmapped interior applies/solves then partition over devices with
        no cross-shard traffic; the boundary chain factors (``_chain_seq`` /
        ``_chain_r`` — O(S·o²)) stay replicated, matching the algorithm's
        communication structure.  No-op when S does not tile the mesh."""
        if self.S % self.mesh.devices.size != 0:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import shard_leading_axis

        (self._Tb, self._j2_top) = shard_leading_axis(
            (self._Tb, self._j2_top), self.mesh, self.axis,
        )
        # SoA stores: the segment axis sits LAST (in lanes)
        def _last(a):
            spec = P(*([None] * (a.ndim - 1) + [self.axis]))
            return jax.device_put(a, NamedSharding(self.mesh, spec))

        self._Yws = _last(self._Yws)
        self._Ts = _last(self._Ts)
        self._Yb = _last(self._Yb)
        self._r_panels = _last(self._r_panels)

    def _detect_panel_fast(self, gm: np.ndarray, nnz: int):
        """Host-side gather-free panel-extraction detection (once per layout).

        Recognized form: every panel's stored entries sit at a constant offset
        ``delta`` from their own linear position in a ``[S*L, mR, mc]``
        row-major layout of the data vector, with ``delta == 0`` everywhere
        except possibly the first panel of each segment (the dropped leading
        overlap shifts those by one shared value ``d0``).  Row-sorted banded
        layouts — every LM-pattern Jacobian built block-row-major — satisfy
        this; row-permuted/analyzed layouts fall back to the element gather.
        Returns ``None`` or ``dict(mask, d0, l0shift)``.
        """
        S, L = self.S, self.L
        g = gm.reshape(S * L, -1).astype(np.int64)
        valid = g != nnz
        lin = np.arange(g.size, dtype=np.int64).reshape(g.shape)
        delta = np.where(valid, g - lin, 0)
        big = np.iinfo(np.int64)
        dmax = np.where(valid, delta, big.min).max(axis=1)
        dmin = np.where(valid, delta, big.max).min(axis=1)
        has = valid.any(axis=1)
        if not bool((~has | (dmax == dmin)).all()):
            return None
        dval = np.where(has, dmax, 0).reshape(S, L)
        if bool((dval[:, 1:] != 0).any()) or dval[0, 0] != 0:
            return None
        nz = np.unique(dval[:, 0][dval[:, 0] != 0])
        if nz.size > 1:
            return None
        d0 = int(nz[0]) if nz.size else 0
        ew = gm.shape[1] * gm.shape[2]
        if d0 and not (0 < d0 <= (L - 1) * ew):
            return None
        return dict(
            mask=jnp.asarray(valid.reshape(gm.shape)),
            d0=d0,
            l0shift=jnp.asarray(dval[:, 0] != 0) if d0 else None,
        )

    def _get_factorize_fn(self, pallas_on: bool = False):
        """Per-plan jitted device pipeline: segment chains (fused Pallas
        kernel or vmapped XLA scan) → lane-major slab Qᵀ → CAQR-compressed
        boundary chain.  Plan metadata (device-resident index/geometry
        arrays) is constant across the repeated factorizations of one
        structure (the LM pattern), so this compiles once per plan."""
        if (
            getattr(self, "_fac_fn", None) is not None
            and getattr(self, "_fac_mode", None) == pallas_on
        ):
            return self._fac_fn
        from .banded_blocked import _shift_panels, banded_factorize

        S, L, o = self.S, self.L, self._overlap
        max_cols, kw, ckw = self._max_cols, dict(self._kw), dict(self._chain_kw)
        nbot2 = self._nbot2
        nloc_max = self._nloc_max
        h1 = kw["max_carry"]

        # NOTE: every device array is a jit ARGUMENT, never a closure capture —
        # a captured device array becomes an MLIR constant, which jax
        # materializes on the HOST at trace time (a device→host fetch through
        # the tunnel) and bakes into the executable; empirically a program
        # carrying multi-MB baked constants also degrades EVERY subsequent
        # host→device transfer in the process ~100× (axon tunnel behavior)
        self._fac_meta = dict(
            carry_d=self._carry_d, nrows_d=self._nrows_d, starts=self._starts,
            colinc_d=self._colinc_d, carry2d=self._carry2d,
            active_d=self._active_d, rows2d=self._rows2d,
            top_valid=self._top_valid, bot_starts=self._bot_starts,
            bot_valid=self._bot_valid, chain_geom=self._chain_geom_dev,
            emit_d=self._emit_d, seg_col0=self._seg_col0_d,
            chain_cols=self._chain_solve_meta[0],
            chain_emit=self._chain_solve_meta[1],
        )
        pf, sf = self._panel_fast, self._slab_fast
        if pf is not None:
            self._fac_meta["panel_mask"] = pf["mask"]
            if pf["d0"]:
                self._fac_meta["panel_l0shift"] = pf["l0shift"]
        else:
            self._fac_meta["panel_gmap"] = self._panel_gmap
        if sf is not None:
            self._fac_meta["slab_lead_t"] = sf["lead_t"]
            self._fac_meta["slab_tail_t"] = sf["tail_t"]
        else:
            self._fac_meta["slab_gmap_t"] = self._slab_gmap_t
        if pallas_on:
            self._fac_meta["act_soa"] = self._act_soa
        grouped = self._chain_regroup is not None
        chain_pl = self._chain_pallas if pallas_on else None
        if chain_pl is not None:
            self._fac_meta["chain_map_t"] = chain_pl["map"]
            self._fac_meta["chain_act"] = chain_pl["act"]
        if grouped:
            self._fac_meta["chain_regroup"] = self._chain_regroup
        p2u = self._p2_uniform
        nuni = self._p2_nuni
        p2s = getattr(self, "_p2_static", None) if p2u else None
        p2g = getattr(self, "_p2_gen_static", None) if p2u else None
        if p2u:
            self._fac_meta["s1u"] = self._s1u
            self._fac_meta["s2u"] = self._s2u
            self._fac_meta["spu"] = self._spu

        mR = self._mRloc
        ew = mR * max_cols
        need = S * L * ew

        if pf is not None:
            d0 = pf["d0"]

            def _extract_panels(pad, meta):
                # gather-free: the data vector IS the panel tensor up to a
                # boolean mask (and one static slice for the shifted first
                # panels of segments 1..); see _detect_panel_fast
                data = pad[:-1]
                flat = (
                    jnp.concatenate(
                        [data, jnp.zeros((need - data.shape[0],), data.dtype)]
                    )
                    if data.shape[0] < need
                    else data[:need]
                )
                base = jnp.where(
                    meta["panel_mask"],
                    flat.reshape(S * L, mR, max_cols),
                    jnp.zeros((), data.dtype),
                )
                if d0:
                    seg = flat.reshape(S, L * ew)
                    l0 = jax.lax.slice(seg, (0, d0), (S, d0 + ew)).reshape(
                        S, mR, max_cols
                    )
                    bs = base.reshape(S, L, mR, max_cols)
                    m0 = meta["panel_mask"].reshape(S, L, mR, max_cols)[:, 0]
                    sel = meta["panel_l0shift"][:, None, None] & m0
                    l0 = jnp.where(sel, l0, bs[:, 0])
                    base = bs.at[:, 0].set(l0).reshape(S * L, mR, max_cols)
                return base

        else:

            def _extract_panels(pad, meta):
                return pad[meta["panel_gmap"]]  # [S*L, mR, max_cols]

        if sf is not None:
            w_, mid = sf["w"], self._max_seg_rows - 2 * sf["w"]

            def _extract_slab(pad, meta):
                lead = pad[meta["slab_lead_t"]]
                tail = pad[meta["slab_tail_t"]]
                return jnp.concatenate(
                    [lead, jnp.zeros((S, 2 * o, mid), pad.dtype), tail], axis=2
                )

        else:

            def _extract_slab(pad, meta):
                return pad[meta["slab_gmap_t"]]

        def _phase1_xla(pad, meta):
            pj = _extract_panels(pad, meta)  # [S*L, mR, max_cols]
            shifted = _shift_panels(
                pj, meta["carry_d"], meta["nrows_d"], kw["max_active"]
            ).reshape(S, L, kw["max_active"], max_cols)
            C0 = jnp.zeros((S, kw["max_carry"], max_cols), pad.dtype)
            _, (Yws, Ts, Vs) = _vmapped_chain(
                C0, shifted, meta["colinc_d"], meta["active_d"],
                max_carry=kw["max_carry"], max_emit=kw["max_emit"],
            )
            return Yws, Ts, Vs

        if pallas_on:
            from ..ops.householder import build_t_factor
            from ..ops.pallas_banded import pallas_segment_chains_soa

            ci_body, ci0_rest = self._pallas_ci
            ma, mca, me = kw["max_active"], kw["max_carry"], kw["max_emit"]
            interp = self._pallas_interpret
            npad = self._pallas_npad

            def _phase1(pad, meta):
                pj = _extract_panels(pad, meta)  # [S*L, mR, max_cols]
                shifted = _shift_panels(
                    pj, meta["carry_d"], meta["nrows_d"], ma
                ).reshape(S, L, ma * max_cols)
                # SoA relayout as ONE dense transpose on device — a
                # [L, ma*mc, npad] element gather map was measured at 72 ms
                # for a 625k-lane case where the panel bytes themselves are
                # ~7 ms of HBM traffic
                soa = jnp.moveaxis(shifted, 0, -1)  # [L, ma*mc, S]
                soa = jnp.pad(soa, ((0, 0), (0, 0), (0, npad - S)))
                y_soa, tau_soa, v_soa = pallas_segment_chains_soa(
                    soa, meta["act_soa"], ma=ma, mc=max_cols, mca=mca,
                    me=me, ci=ci_body, ci0_rest=ci0_rest, interpret=interp,
                )
                Yws = jnp.moveaxis(y_soa[:, :, :S], -1, 0).reshape(
                    S, L, ma, max_cols
                )
                taus = jnp.moveaxis(tau_soa[:, :, :S], -1, 0)  # [S, L, mc]
                Vs = jnp.moveaxis(v_soa[:, :, :S], -1, 0).reshape(
                    S, L, me, max_cols
                )
                Ts = jax.vmap(jax.vmap(build_t_factor))(Yws, taus)
                return Yws, Ts, Vs

        else:
            _phase1 = _phase1_xla

        rbm = self._rbot_max
        ncols_total, m1 = self.cols, self._m1
        chk = self._health_check_zero_pivot

        def _health(Vs, chain_r, meta):
            # info()'s health probe, folded into the factorize program (the
            # eager r_diagonal assembly cost ~40 tiny dispatches per
            # refactorize through the accelerator tunnel) — same scatter as
            # :meth:`r_diagonal`, on the pre-moveaxis [S, L, me, mc] panels
            d = jnp.diagonal(Vs, axis1=2, axis2=3)  # [S, L, k]
            j = jnp.arange(d.shape[2])
            pos = (
                meta["seg_col0"][:, None, None]
                + meta["starts"][:, :, None]
                + j[None, None, :]
            )
            valid = (j[None, None, :] < meta["emit_d"][:, :, None]) & meta[
                "active_d"
            ][:, :, None]
            idx = jnp.where(valid, pos, ncols_total)
            out = jnp.zeros((ncols_total,), d.dtype).at[idx].set(d, mode="drop")
            d2 = jnp.diagonal(chain_r, axis1=1, axis2=2)
            j2 = jnp.arange(d2.shape[1])
            pos2 = m1 + meta["chain_cols"].astype(jnp.int32)[:, None] + j2[None, :]
            valid2 = j2[None, :] < meta["chain_emit"][:, None]
            out = out.at[jnp.where(valid2, pos2, ncols_total)].set(d2, mode="drop")
            return _diag_health(out, check_zero=chk)

        @jax.jit
        def fac(data, meta):
            dtype = data.dtype
            pad = jnp.concatenate([data, jnp.zeros((1,), dtype)])
            slab_t = _extract_slab(pad, meta)  # [S, 2o, seg_rows(pad)] lane-major
            Yws, Ts, Vs = _phase1(pad, meta)
            qt_slab = (
                _apply_cols_split(
                    Yws, Ts, meta, slab_t, h1, True, nuni, p2s, p2g
                )
                if p2u
                else _segment_apply_cols(
                    Yws, Ts, meta["starts"], meta["rows2d"], meta["carry2d"],
                    slab_t, h1, True,
                )
            )
            # stored LANE-MAJOR [S, 2o, nloc]: the AoS [S, nloc, 2o] form is
            # 128/(2o)-fold lane-padded (61 MB effective at 20k blocks), and
            # qt_slab is already lane-major so no transpose is needed at all
            j2_top = jnp.where(
                meta["top_valid"][:, None, :],
                qt_slab[:, :, :nloc_max],
                jnp.zeros((), dtype),
            )
            # bottom rows cut straight from the LANE-MAJOR slab: an AoS
            # [S, rbot, 2o] bot is 128/(2o)-fold lane-padded and the vmapped
            # per-segment QR paid that on every column pass (37 ms of the
            # 20k-block factorize); instead keep rows in lanes and run the
            # batched SoA panel QR with the segment axis in lanes.  Each
            # segment's bottom rows are a CONTIGUOUS run starting at its
            # local column count (by construction, _prepare_segmentation), so
            # the cut is one batched dynamic_slice — the take_along_axis
            # element gather here was 28 ms of the 20k-block factorize.
            qs_pad = jnp.concatenate(
                [qt_slab, jnp.zeros((S, 2 * o, rbm), dtype)], axis=2
            )
            bot = jax.vmap(
                lambda sl, st: jax.lax.dynamic_slice(
                    sl, (jnp.zeros((), st.dtype), st), (2 * o, rbm)
                )
            )(qs_pad, meta["bot_starts"])  # [S, 2o, rbot_max]
            bot = jnp.where(meta["bot_valid"][:, None, :], bot, jnp.zeros((), dtype))
            # chain block 0 has no leading boundary: its local columns are the
            # trailing slab columns (the wrapped leading part is zero)
            bot = bot.at[0].set(jnp.roll(bot[0], -o, axis=0))
            bot_soa = jnp.transpose(bot, (2, 1, 0))  # [rbot, 2o, S]
            # CAQR compression: ONE batched SoA QR reduces each [rbot, 2o]
            # slab to its [2o, 2o] R factor — batch-parallel (and
            # shard-parallel) — so the sequential boundary chain runs over
            # tiny factors.  Yb stays SoA ([rbot, 2o, S], segments in lanes):
            # the fused solve consumes it that way; protocol paths transpose.
            Yb, Tb_soa, Rb_top = panel_qr_yt_soa(bot_soa)
            Tb = jnp.transpose(Tb_soa, (2, 0, 1))  # [S, 2o, 2o] (small)
            comp = jnp.triu(jnp.transpose(Rb_top, (2, 0, 1)))
            if chain_pl is not None:
                # whole boundary chain in ONE kernel launch; the gather map
                # folds the regroup, the carry row shift, and the X-layout
                # transpose (see _chain_pallas at plan time)
                from ..ops.pallas_banded import pallas_chain_qr

                compf = jnp.concatenate(
                    [comp.reshape(-1), jnp.zeros((1,), dtype)]
                )
                pant = compf[meta["chain_map_t"]]
                y_t, taus_c, v_t = pallas_chain_qr(
                    pant, meta["chain_act"], **chain_pl["statics"],
                    interpret=interp,
                )
                ncb = chain_pl["nb"]
                Ywc = jnp.swapaxes(y_t[:ncb], 1, 2)
                Tsc = jax.vmap(build_t_factor)(Ywc, taus_c[:ncb])
                chain_r = jnp.swapaxes(v_t[:ncb], 1, 2)
                cgd = meta["chain_geom"]
                chain_seq = TwoSegmentWYSeq(
                    Ywc, Tsc, cgd["cols"].astype(jnp.int32),
                    cgd["rows"].astype(jnp.int32),
                    cgd["carry_rows"].astype(jnp.int32),
                    h1=max(ckw["max_carry"], 1), m=nbot2,
                )
            else:
                if grouped:
                    compf = jnp.concatenate(
                        [comp.reshape(-1), jnp.zeros((1,), dtype)]
                    )
                    pan = compf[meta["chain_regroup"]]
                else:
                    pan = comp[..., : ckw["max_cols"]]
                chain_seq, chain_r = banded_factorize(
                    pan, meta["chain_geom"], **ckw, m=nbot2
                )
            # STORED factor layout is SoA ([L, ma, mc, S] / [L, mc, mc, S],
            # segment axis last): a jit OUTPUT gets the default tiled layout,
            # and the AoS [S, L, ma, mc] form with mc ≪ 128 minor is
            # ~(128/mc)-fold lane-padded in HBM — the factors are written
            # once per factorize and read by every solve, so the store/load
            # layout matters even though the in-program uses above keep
            # compiler-chosen internal layouts.  Consumers transpose back
            # inside their own jitted programs.
            return (
                jnp.moveaxis(Yws, 0, -1), jnp.moveaxis(Ts, 0, -1),
                jnp.moveaxis(Vs, 0, -1), j2_top, Yb, Tb, chain_seq, chain_r,
                _health(Vs, chain_r, meta),
            )

        self._fac_fn = fac
        self._fac_mode = pallas_on
        return fac

    def r_diagonal(self) -> jnp.ndarray:
        """diag(R) in P_split column order: interior panels then the boundary R2."""
        if self._delegate is not None:
            return self._delegate.r_diagonal()
        # SoA store [L, me, mc, S]: diagonal then put segments first
        d = jnp.swapaxes(
            jnp.diagonal(self._r_panels, axis1=1, axis2=2), 0, 1
        )  # [S, L, k]
        k = d.shape[2]
        j = jnp.arange(k)
        pos = (
            self._seg_col0_d[:, None, None]
            + self._starts[:, :, None]
            + j[None, None, :]
        )
        valid = (j[None, None, :] < self._emit_d[:, :, None]) & self._active_d[
            :, :, None
        ]
        n = self.cols
        idx = jnp.where(valid, pos, n)
        out = jnp.zeros((n,), d.dtype).at[idx].set(d, mode="drop")
        # boundary diag from the chain's R panels
        cols_d, emit_d, _ = self._chain_solve_meta
        d2 = jnp.diagonal(self._chain_r, axis1=1, axis2=2)  # [S, k2]
        j2i = jnp.arange(d2.shape[1])
        pos2 = self._m1 + cols_d[:, None] + j2i[None, :]
        valid2 = j2i[None, :] < emit_d[:, None]
        out = out.at[jnp.where(valid2, pos2, n)].set(d2, mode="drop")
        return out

    # --- left (segment) Q ------------------------------------------------------
    def _gather_maps(self):
        """Precompute index maps between global rows and padded segment rows."""
        if hasattr(self, "_seg_gather"):
            return
        S = self.S
        R = self._max_seg_rows
        # padded lanes point OUT of bounds so scatters drop them (an in-bounds
        # sentinel would clobber a real row)
        gather = np.full((S, R), self._nrows, dtype=np.int64)
        valid = np.zeros((S, R), dtype=bool)
        for s in range(S):
            n = self._seg_rows[s]
            gather[s, :n] = self._seg_row0[s] + np.arange(n)
            valid[s, :n] = True
        self._seg_gather = _imap(gather)
        self._seg_valid = jnp.asarray(valid)
        # contiguity fast path: when segments tile [0, nrows) in R-row chunks
        # (every interior segment full, the tail possibly short), the padded
        # per-segment gather of a length-nrows vector is a pad + reshape —
        # the element gather costs ~0.7 ms at 100k rows (150M elem/s), the
        # reshape is free
        r0 = np.asarray(self._seg_row0, dtype=np.int64)
        sr = np.asarray(self._seg_rows, dtype=np.int64)
        self._seg_contig = bool(
            (r0 == np.arange(S, dtype=np.int64) * R).all()
            and (sr == np.minimum(R, self._nrows - r0)).all()
        )
        # output reordering: all segments' R-rows (n_loc each) first, then rest
        order = []
        for s in range(S):
            order.extend(range(self._seg_row0[s], self._seg_row0[s] + self._seg_ncols[s]))
        for s in range(S):
            order.extend(
                range(self._seg_row0[s] + self._seg_ncols[s], self._seg_row0[s] + self._seg_rows[s])
            )
        self._row_order = _imap(order)
        self._row_order_inv = _imap(np.argsort(np.asarray(order)))

    # --- QRSolver interface -----------------------------------------------------
    def _apply_factors(self):
        """The factor pytree passed into the jitted apply programs — every
        device array is a jit ARGUMENT (a closure-captured device array would
        be baked into the executable as a constant via a host round trip)."""
        return dict(
            Yws=self._Yws, Ts=self._Ts, Yb=self._Yb, Tb=self._Tb,
            chain_seq=self._chain_seq,
        )

    def _apply_meta(self):
        """Per-plan device index maps consumed by the apply programs."""
        self._gather_maps()
        return dict(
            starts=self._starts, rows2d=self._rows2d, carry2d=self._carry2d,
            seg_gather=self._seg_gather, seg_valid=self._seg_valid,
            row_order=self._row_order, row_order_inv=self._row_order_inv,
            rbot_gather=self._rbot_gather, rbot_gather_t=self._rbot_gather_t,
            rbot_valid_t=self._rbot_valid_t, rest_pos=self._rest_pos,
        )

    def _get_apply_fns(self):
        """Jitted one-dispatch Q/Qᵀ matrix programs, cached per plan.

        The old eager composition (per-segment apply → scatter → reorder →
        bottom Qb → chain → scatter) issued ~8 primitive dispatches per
        apply; through a remote-accelerator tunnel each costs a round trip."""
        if getattr(self, "_apply_fns", None) is None:
            st = dict(
                S=self.S, R=self._max_seg_rows, nrows=self._nrows,
                m1=self._m1, nbot=self._nbot, nbot2=self._nbot2,
                rbot_max=self._rbot_max, o=self._overlap,
                h1=self._kw["max_carry"],
            )
            self._apply_fns = (
                jax.jit(functools.partial(_seg_qt_program, **st)),
                jax.jit(functools.partial(_seg_q_program, **st)),
            )
        return self._apply_fns

    def apply_qt(self, m: jnp.ndarray) -> jnp.ndarray:
        if self._delegate is not None:
            return self._delegate.apply_qt(m)
        vec = m.ndim == 1
        m2 = m[:, None] if vec else m
        qt, _ = self._get_apply_fns()
        out = qt(self._apply_factors(), self._apply_meta(), m2)
        return out[:, 0] if vec else out

    def apply_q(self, m: jnp.ndarray) -> jnp.ndarray:
        if self._delegate is not None:
            return self._delegate.apply_q(m)
        vec = m.ndim == 1
        m2 = m[:, None] if vec else m
        _, q = self._get_apply_fns()
        out = q(self._apply_factors(), self._apply_meta(), m2)
        return out[:, 0] if vec else out

    # --- sparse-operand Q products (BandedBlockedSparseQR.h:693-700) --------------
    def _sparse_apply_parts(self, transpose: bool):
        """(fill_fn, apply_fn) for the fused sparse Q-product machinery
        (:mod:`~qrkit_tpu.solvers.sparse_apply`)."""
        if self._delegate is not None:
            return self._delegate._sparse_apply_parts(transpose)
        from .sparse_apply import segmented_structural_fill

        def fill(op, row_map):
            return segmented_structural_fill(self, op, transpose, row_map)

        qt, q = self._get_apply_fns()
        return fill, (qt if transpose else q)

    def _sparse_apply_state(self):
        if self._delegate is not None:
            return self._delegate._sparse_apply_state()
        return self._apply_factors(), self._apply_meta()

    def apply_qt_sparse(self, s: SparseCSR) -> SparseCSR:
        """``Qᵀ · S`` for a sparse operand, kept sparse end to end
        (the reference's ``matrixQ().transpose() * spMat``,
        BandedBlockedSparseQR.h:693-700); plan-cached per operand layout."""
        from .sparse_apply import solver_sparse_apply

        return solver_sparse_apply(self, s, True)

    def apply_q_sparse(self, s: SparseCSR) -> SparseCSR:
        """``Q · S`` for a sparse operand (BandedBlockedSparseQR.h:722-729)."""
        from .sparse_apply import solver_sparse_apply

        return solver_sparse_apply(self, s, False)

    def _ensure_col_gather(self):
        """Lazy per-plan column maps: padded per-segment column slot -> global
        column (used by the interior back-substitution and the fused solve)."""
        if hasattr(self, "_col_gather"):
            return
        nloc_max, mc = self._nloc_max, self._max_cols
        cg = np.zeros((self.S, nloc_max + mc), dtype=np.int64)
        cv = np.zeros((self.S, nloc_max + mc), dtype=bool)
        for s in range(self.S):
            n = self._seg_ncols[s]
            cg[s, :n] = self._seg_col0[s] + np.arange(n)
            cv[s, :n] = True
        self._col_gather = _imap(cg)
        self._col_valid = jnp.asarray(cv)
        # run-structure fast path: the R-row block of the solve work vector
        # ([m1], global-column order) is the concatenation of per-segment
        # contiguous runs exactly when each segment's local columns start at
        # the cumulative count — then rhs windows never need the [m1] vector
        # at all (the fused solve reads them straight off the [S, R] apply
        # output and skips a full-length scatter + reorder gather)
        c0 = np.asarray(self._seg_col0, dtype=np.int64)
        nc = np.asarray(self._seg_ncols, dtype=np.int64)
        self._col_runs = bool(
            (c0 == np.concatenate([[0], np.cumsum(nc)[:-1]])).all()
        )

    def solve_r(self, y: jnp.ndarray) -> jnp.ndarray:
        """Two-phase back-substitution: boundary chain, then vmapped interior."""
        if self._delegate is not None:
            return self._delegate.solve_r(y)
        m1, m2 = self._m1, self._m2
        o = self._overlap
        from .banded_blocked import banded_solve_r

        cols_d, emit_d, ncols_d = self._chain_solve_meta
        x2 = banded_solve_r(
            self._chain_r,
            cols_d,
            emit_d,
            ncols_d,
            y[m1 : m1 + m2],
            max_emit=self._chain_kw["max_emit"],
            max_cols=self._chain_kw["max_cols"],
            n=m2,
        )
        # rhs1 = y[:m1] - J2_top x2, via the structured [S, nloc, 2o] slabs
        x2pad = jnp.concatenate(
            [jnp.zeros((o,), x2.dtype), x2, jnp.zeros((o,), x2.dtype)]
        )
        x2seg = x2pad[self._x2_idx]  # [S, 2o]
        contrib = highest_precision(jnp.einsum)("sjn,sj->sn", self._j2_top, x2seg)
        # vmapped per-segment banded back-substitution
        S, L = self.S, self.L
        nloc_max = self._nloc_max
        dt = x2.dtype
        mc = self._max_cols
        self._ensure_col_gather()
        idx_top = jnp.where(
            self._col_valid[:, :nloc_max], self._col_gather[:, :nloc_max], m1
        )
        rhs1 = y[:m1] - jnp.zeros((m1,), dt).at[idx_top].add(contrib, mode="drop")
        ypad = jnp.where(self._col_valid, rhs1[self._col_gather], jnp.zeros((), dt))
        rp_aos = jnp.moveaxis(self._r_panels, -1, 0)
        if self._p2_uniform and self._bs_uniform:
            xs = _interior_backsub_split(
                ypad, rp_aos,
                dict(starts=self._starts, emit2d=self._emit_d,
                     ncols_loc_d=self._ncols_d, active_d=self._active_d,
                     s1u=self._s1u, eru=self._eru, ncu=self._ncu),
                self._max_emit, mc, self._bs_nuni,
                bss=getattr(self, "_bs_static", None),
                bs_gen=getattr(self, "_bs_gen_static", None),
            )
        else:
            xs = jax.vmap(
                lambda xp, yp, rp, cols, er, nc, act: _banded_solve_chunk(
                    xp, yp, rp, cols, er, nc, act,
                    max_emit=self._max_emit, max_cols=mc,
                )
            )(
                jnp.zeros_like(ypad), ypad, rp_aos,
                self._starts, self._emit_d, self._ncols_d, self._active_d,
            )
        idx = jnp.where(self._col_valid, self._col_gather, m1)
        x1 = jnp.zeros((m1,), dt).at[idx].set(xs, mode="drop")
        return jnp.concatenate([x1, x2])

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """Least-squares solve as ONE compiled dispatch (the protocol-default
        apply_qt → solve_r → back-permutation path issues ~15 eager primitive
        dispatches; through a remote-accelerator tunnel each costs a round
        trip)."""
        if self._delegate is not None:
            return self._delegate.solve(b)
        if b.ndim != 1:
            # matrix RHS: fused one-dispatch program for the lane-major k ≤ 16
            # regime; wider RHS fall back to the protocol path (k ≥ 128 fills
            # the lanes on its own, so the row-major default is already fine)
            if 1 <= b.shape[1] <= 16:
                fn = self._get_solve_mat_fn()
                return fn(
                    self._Yws, self._Ts, self._Yb, self._Tb, self._chain_seq,
                    self._chain_r, self._j2_top, self._r_panels, b,
                    self._sol_meta,
                )
            return super().solve(b)
        fn = self._get_solve_fn()
        return fn(
            self._Yws, self._Ts, self._Yb, self._Tb, self._chain_seq,
            self._chain_r, self._j2_top, self._r_panels, b, self._sol_meta,
        )

    def _get_solve_fn(self):
        if getattr(self, "_solve_fn", None) is not None:
            return self._solve_fn
        from .banded_blocked import banded_solve_r

        self._gather_maps()
        self._ensure_col_gather()  # lazy per-plan solve maps (shared with solve_r)

        m1, m2, o = self._m1, self._m2, self._overlap
        S, mc, nloc_max = self.S, self._max_cols, self._nloc_max
        ckw = dict(self._chain_kw)
        h1 = self._kw["max_carry"]
        nrows_tot, max_emit = self._nrows, self._max_emit
        perm = self._cols_perm
        has_perm = not perm.is_identity()
        nbot, nbot2 = self._nbot, self._nbot2

        cols_d, emit_d, ncols_d = self._chain_solve_meta
        p2u = self._p2_uniform
        nuni = self._p2_nuni
        p2s = getattr(self, "_p2_static", None) if p2u else None
        p2g = getattr(self, "_p2_gen_static", None) if p2u else None
        # every device array is a jit argument — see _get_factorize_fn
        self._sol_meta = dict(
            starts=self._starts, rows2d=self._rows2d, carry2d=self._carry2d,
            cols_d=cols_d, emit_d=emit_d, ncols_d=ncols_d,
            x2_idx=self._x2_idx, ncols_loc_d=self._ncols_d,
            active_d=self._active_d, emit2d=self._emit_d,
            seg_gather=self._seg_gather, seg_valid=self._seg_valid,
            row_order=self._row_order, rbot_gather_t=self._rbot_gather_t,
            rbot_valid_t=self._rbot_valid_t, col_gather=self._col_gather,
            col_valid=self._col_valid,
        )
        if has_perm:
            self._sol_meta["gather_cols"] = jnp.asarray(perm.gather_indices())
        if p2u:
            self._sol_meta["s1u"] = self._s1u
            self._sol_meta["s2u"] = self._s2u
            self._sol_meta["spu"] = self._spu
        bsu = p2u and self._bs_uniform
        bs_nuni = self._bs_nuni if bsu else 0
        bss = getattr(self, "_bs_static", None) if bsu else None
        bsg = getattr(self, "_bs_gen_static", None) if bsu else None
        if bsu:
            self._sol_meta["eru"] = self._eru
            self._sol_meta["ncu"] = self._ncu
        # segment-space fast paths (see _gather_maps/_ensure_col_gather):
        # seg_contig lets the input gather become pad+reshape; col_runs lets
        # the whole pipeline stay in [S, R] segment space — the bottom
        # windows are batched dynamic slices of the apply output and the
        # interior rhs is formed per segment, skipping the full-length
        # scatter, the R-rows-first reorder gather, and the [rbot_max, S]
        # bottom gather (three ~100k-element index ops, ~0.6 ms each on TPU)
        seg_contig = self._seg_contig
        col_runs = self._col_runs
        R_seg, rbm = self._max_seg_rows, self._rbot_max
        if col_runs:
            self._sol_meta["bot_starts"] = self._bot_starts
            self._sol_meta["rbot_valid"] = self._rbot_valid

        @jax.jit
        def sol(Yws, Ts, Yb, Tb, chain_seq, chain_r, j2_top, r_panels, b, meta):
            dt = b.dtype
            # stored factors arrive SoA (segment axis last, unpadded store);
            # the AoS working form here is jit-internal, compiler-laid-out
            Yws = jnp.moveaxis(Yws, -1, 0)
            Ts = jnp.moveaxis(Ts, -1, 0)
            r_panels = jnp.moveaxis(r_panels, -1, 0)
            seg_gather, seg_valid = meta["seg_gather"], meta["seg_valid"]
            col_gather, col_valid = meta["col_gather"], meta["col_valid"]
            # Q1ᵀ b (per-segment), lane-major ([S, 1, rows] — a [rows, 1]
            # vector operand would be 128×-padded in the lane dim)
            if seg_contig:
                vt = jnp.pad(b, (0, S * R_seg - nrows_tot)).reshape(
                    S, 1, R_seg
                )
            else:
                vt = jnp.where(
                    seg_valid[:, None, :],
                    b[jnp.clip(seg_gather, 0, nrows_tot - 1)][:, None, :],
                    jnp.zeros((), dt),
                )
            out = (
                _apply_cols_split(Yws, Ts, meta, vt, h1, True, nuni, p2s, p2g)
                if p2u
                else _segment_apply_cols(
                    Yws, Ts, meta["starts"], meta["rows2d"], meta["carry2d"],
                    vt, h1, True,
                )
            )
            # compressed boundary reduction Qᵀ + back-substitution: only the
            # chain-space rows matter for x2, so the pass-through rows of the
            # full _bot_qt are skipped — and the whole apply runs in the SoA
            # layout Yb is stored in ([rbot, 2o, S], segments in lanes),
            # forming only the 2o chain-space output rows
            if col_runs:
                # segment-space form: bottom windows are per-segment
                # contiguous runs of the apply output right after the local
                # R rows — one batched dynamic slice, no [nrows] scatter +
                # reorder gather + [rbot_max, S] bottom gather
                out2 = out[:, 0, :]  # [S, R]
                outp = jnp.concatenate(
                    [out2, jnp.zeros((S, rbm), dt)], axis=1
                )
                wrows = jax.vmap(
                    lambda row, st: jax.lax.dynamic_slice(row, (st,), (rbm,))
                )(outp, meta["bot_starts"])
                wrows = jnp.where(meta["rbot_valid"], wrows, jnp.zeros((), dt))
                w = wrows.T[:, None, :]  # [rbot_max, 1, S]
            else:
                scat = jnp.zeros((nrows_tot,), dt)
                scat = scat.at[seg_gather.reshape(-1)].set(
                    out[:, 0, :].reshape(-1), mode="drop"
                )
                top = scat[meta["row_order"]]
                w = jnp.where(
                    meta["rbot_valid_t"][:, None, :],
                    top[m1:][jnp.clip(meta["rbot_gather_t"], 0, nbot - 1)][
                        :, None, :
                    ],
                    jnp.zeros((), dt),
                )  # [rbot_max, 1, S]
            w2o = _batched_wy_soa(Yb, Tb, w, True, out_rows=2 * o)
            ybot = chain_seq.apply_qt(w2o[:, 0, :].T.reshape(nbot2))
            x2 = banded_solve_r(
                chain_r, meta["cols_d"], meta["emit_d"], meta["ncols_d"],
                ybot[:m2],
                max_emit=ckw["max_emit"], max_cols=ckw["max_cols"], n=m2,
            )
            x2pad = jnp.concatenate(
                [jnp.zeros((o,), dt), x2, jnp.zeros((o,), dt)]
            )
            contrib = highest_precision(jnp.einsum)(
                "sjn,sj->sn", j2_top, x2pad[meta["x2_idx"]]
            )
            if col_runs:
                # interior rhs per segment straight off the apply output:
                # top[:m1] is the concatenation of out2[s, :nloc[s]] runs,
                # and col_gather windows are exactly those runs
                rhs_seg = out2[:, :nloc_max] - contrib  # [S, nloc_max]
                ypad = jnp.where(
                    col_valid,
                    jnp.concatenate(
                        [rhs_seg, jnp.zeros((S, mc), dt)], axis=1
                    ),
                    jnp.zeros((), dt),
                )
            else:
                idx_top = jnp.where(
                    col_valid[:, :nloc_max], col_gather[:, :nloc_max], m1
                )
                rhs1 = top[:m1] - jnp.zeros((m1,), dt).at[idx_top].add(
                    contrib, mode="drop"
                )
                ypad = jnp.where(
                    col_valid, rhs1[col_gather], jnp.zeros((), dt)
                )
            if bsu:
                xs = _interior_backsub_split(
                    ypad, r_panels, meta, max_emit, mc, bs_nuni,
                    bss=bss, bs_gen=bsg,
                )
            else:
                xs = jax.vmap(
                    lambda xp, yp, rp, cs, er, nc, act: _banded_solve_chunk(
                        xp, yp, rp, cs, er, nc, act, max_emit=max_emit, max_cols=mc
                    )
                )(
                    jnp.zeros_like(ypad), ypad, r_panels, meta["starts"],
                    meta["emit2d"], meta["ncols_loc_d"], meta["active_d"],
                )
            idx = jnp.where(col_valid, col_gather, m1)
            x1 = jnp.zeros((m1,), dt).at[idx].set(xs, mode="drop")
            z = jnp.concatenate([x1, x2])
            return z[meta["gather_cols"]] if has_perm else z

        self._solve_fn = sol
        return sol

    def _get_solve_mat_fn(self):
        """Fused least-squares solve for a [m, k] RHS (k ≤ 16), ONE compiled
        dispatch per (plan, k) — the protocol default (eager apply_qt +
        vmapped solve_r + gather) issues a dispatch round trip per primitive.

        Same pipeline as the vector program in :meth:`_get_solve_fn`, with the
        lane-major work buffers widened from k=1 to k columns and the two
        back-substitutions vmapped over the RHS axis."""
        if getattr(self, "_solve_mat_fn", None) is not None:
            return self._solve_mat_fn
        from .banded_blocked import banded_solve_r

        self._get_solve_fn()  # builds + caches self._sol_meta
        m1, m2, o = self._m1, self._m2, self._overlap
        S, mc, nloc_max = self.S, self._max_cols, self._nloc_max
        ckw = dict(self._chain_kw)
        h1 = self._kw["max_carry"]
        nrows_tot, max_emit = self._nrows, self._max_emit
        has_perm = not self._cols_perm.is_identity()
        nbot, nbot2 = self._nbot, self._nbot2
        p2u = self._p2_uniform
        nuni = self._p2_nuni
        p2s = getattr(self, "_p2_static", None) if p2u else None
        p2g = getattr(self, "_p2_gen_static", None) if p2u else None
        bsu = p2u and self._bs_uniform
        bs_nuni = self._bs_nuni if bsu else 0
        bss = getattr(self, "_bs_static", None) if bsu else None
        bsg = getattr(self, "_bs_gen_static", None) if bsu else None
        seg_contig = self._seg_contig
        col_runs = self._col_runs
        S_ = self.S
        R_seg, rbm = self._max_seg_rows, self._rbot_max

        @jax.jit
        def sol_mat(Yws, Ts, Yb, Tb, chain_seq, chain_r, j2_top, r_panels, b2, meta):
            dt = b2.dtype
            k = b2.shape[1]
            Yws = jnp.moveaxis(Yws, -1, 0)
            Ts = jnp.moveaxis(Ts, -1, 0)
            r_panels = jnp.moveaxis(r_panels, -1, 0)
            seg_gather, seg_valid = meta["seg_gather"], meta["seg_valid"]
            col_gather, col_valid = meta["col_gather"], meta["col_valid"]
            if seg_contig:
                vt = jnp.moveaxis(
                    jnp.pad(
                        b2, ((0, S_ * R_seg - nrows_tot), (0, 0))
                    ).reshape(S_, R_seg, k),
                    1, 2,
                )  # [S, k, R]
            else:
                vt = jnp.where(
                    seg_valid[:, None, :],
                    jnp.moveaxis(
                        b2[jnp.clip(seg_gather, 0, nrows_tot - 1)], 1, 2
                    ),
                    jnp.zeros((), dt),
                )  # [S, k, R]
            out = (
                _apply_cols_split(Yws, Ts, meta, vt, h1, True, nuni, p2s, p2g)
                if p2u
                else _segment_apply_cols(
                    Yws, Ts, meta["starts"], meta["rows2d"], meta["carry2d"],
                    vt, h1, True,
                )
            )
            if col_runs:
                outp = jnp.concatenate(
                    [out, jnp.zeros((S_, k, rbm), dt)], axis=2
                )
                wrows = jax.vmap(
                    lambda rows, st: jax.lax.dynamic_slice(
                        rows, (jnp.zeros((), st.dtype), st), (k, rbm)
                    )
                )(outp, meta["bot_starts"])  # [S, k, rbm]
                wrows = jnp.where(
                    meta["rbot_valid"][:, None, :], wrows, jnp.zeros((), dt)
                )
                w = jnp.transpose(wrows, (2, 1, 0))  # [rbot_max, k, S]
            else:
                scat = jnp.zeros((nrows_tot, k), dt)
                scat = scat.at[seg_gather.reshape(-1)].set(
                    jnp.moveaxis(out, 1, 2).reshape(-1, k), mode="drop"
                )
                top = scat[meta["row_order"]]
                w = jnp.where(
                    meta["rbot_valid_t"][:, None, :],
                    jnp.moveaxis(
                        top[m1:][jnp.clip(meta["rbot_gather_t"], 0, nbot - 1)],
                        1, 2,
                    ),
                    jnp.zeros((), dt),
                )  # [rbot_max, k, S]
            w2o = _batched_wy_soa(Yb, Tb, w, True, out_rows=2 * o)
            ybot = jnp.moveaxis(w2o, 2, 0).reshape(nbot2, k)
            ybot = chain_seq.apply_qt(ybot)
            x2 = jax.vmap(
                lambda y: banded_solve_r(
                    chain_r, meta["cols_d"], meta["emit_d"], meta["ncols_d"],
                    y, max_emit=ckw["max_emit"], max_cols=ckw["max_cols"], n=m2,
                ),
                in_axes=1, out_axes=1,
            )(ybot[:m2])  # [m2, k]
            x2pad = jnp.concatenate(
                [jnp.zeros((o, k), dt), x2, jnp.zeros((o, k), dt)]
            )
            contrib = highest_precision(jnp.einsum)(
                "sjn,sjk->snk", j2_top, x2pad[meta["x2_idx"]]
            )
            if col_runs:
                rhs_seg = (
                    jnp.moveaxis(out[:, :, :nloc_max], 1, 2) - contrib
                )  # [S, nloc_max, k]
                ypad = jnp.where(
                    col_valid[..., None],
                    jnp.concatenate(
                        [rhs_seg, jnp.zeros((S_, mc, k), dt)], axis=1
                    ),
                    jnp.zeros((), dt),
                )  # [S, nloc+mc, k]
            else:
                idx_top = jnp.where(
                    col_valid[:, :nloc_max], col_gather[:, :nloc_max], m1
                )
                rhs1 = top[:m1] - jnp.zeros((m1, k), dt).at[idx_top].add(
                    contrib, mode="drop"
                )
                ypad = jnp.where(
                    col_valid[..., None], rhs1[col_gather], jnp.zeros((), dt)
                )  # [S, nloc+mc, k]
            if bsu:
                xs = jax.vmap(
                    lambda yp: _interior_backsub_split(
                        yp, r_panels, meta, max_emit, mc, bs_nuni,
                        bss=bss, bs_gen=bsg,
                    ),
                    in_axes=2, out_axes=2,
                )(ypad)
            else:
                xs = jax.vmap(
                    lambda yp: jax.vmap(
                        lambda xp, ypp, rp, cs, er, nc, act: _banded_solve_chunk(
                            xp, ypp, rp, cs, er, nc, act,
                            max_emit=max_emit, max_cols=mc,
                        )
                    )(
                        jnp.zeros_like(yp), yp, r_panels, meta["starts"],
                        meta["emit2d"], meta["ncols_loc_d"], meta["active_d"],
                    ),
                    in_axes=2, out_axes=2,
                )(ypad)
            idx = jnp.where(col_valid, col_gather, m1)
            x1 = jnp.zeros((m1, k), dt).at[idx].set(xs, mode="drop")
            z = jnp.concatenate([x1, x2])
            return z[meta["gather_cols"]] if has_perm else z

        self._solve_mat_fn = sol_mat
        return sol_mat

    def matrix_r_dense(self) -> jnp.ndarray:
        """Dense R in the P_split column order (tests)."""
        if self._delegate is not None:
            return self._delegate.matrix_r_dense()
        n = self.cols
        m1, m2, o = self._m1, self._m2, self._overlap
        rp = np.moveaxis(np.asarray(self._r_panels), -1, 0)  # -> [S, L, me, mc]
        R = np.zeros((self._nrows, n), dtype=rp.dtype)
        for s in range(self.S):
            base = int(self._seg_col0[s])
            for j in range(self.L):
                if not self._active[s, j]:
                    continue
                er = int(self._emit[s, j])
                nc = int(self._loc_geom["ncols"][s, j])
                c0 = base + int(self._loc_geom["cols"][s, j])
                R[c0 : c0 + er, c0 : c0 + nc] = rp[s, j, :er, :nc]
        # top-right: the structured J2 slabs scattered to their boundary columns
        # (device store is lane-major [S, 2o, nloc]; row-major here for slicing)
        jt = np.asarray(self._j2_top).transpose(0, 2, 1)
        for s in range(self.S):
            nloc = self._seg_ncols[s]
            r0 = int(self._seg_col0[s])
            for c in range(2 * o):
                gb = (s - 1) * o + c
                if 0 <= gb < m2:
                    R[r0 : r0 + nloc, m1 + gb] = jt[s, :nloc, c]
        # bottom-right: the boundary chain's R panels
        cr = np.asarray(self._chain_r)
        cg = self._chain_geom
        for i in range(len(cg["ncols"])):
            er = int(cg["emit_rows"][i])
            nc = int(cg["ncols"][i])
            c0 = int(cg["cols"][i])
            R[m1 + c0 : m1 + c0 + er, m1 + c0 : m1 + c0 + nc] = cr[i, :er, :nc]
        return jnp.asarray(R)

    def matrix_r_sparse(self):
        """Sparse R (P_split column order) in O(nnz(R)): interior panels +
        structured J2-top slabs + boundary chain panels as triplets."""
        if self._delegate is not None:
            return self._delegate.matrix_r_sparse()
        from ..sparse import SparseCSR

        m1, m2, o = self._m1, self._m2, self._overlap
        trips = []

        # SoA store; row-major [S, L, max_emit, max_cols] for the triplet build
        rp = np.moveaxis(np.asarray(self._r_panels), -1, 0)
        base = (np.asarray(self._seg_col0)[:, None] + self._loc_geom["cols"])[
            :, :, None, None
        ]
        er = self._emit[:, :, None, None]
        nc = self._loc_geom["ncols"][:, :, None, None]
        ri = np.arange(rp.shape[2])[None, None, :, None]
        ci = np.arange(rp.shape[3])[None, None, None, :]
        mask = (
            self._active[:, :, None, None]
            & (ri < er) & (ci < nc) & (ri <= ci) & (rp != 0.0)
        )
        trips.append(
            (
                np.broadcast_to(base + ri, rp.shape)[mask],
                np.broadcast_to(base + ci, rp.shape)[mask],
                rp[mask],
            )
        )

        # device store is lane-major [S, 2o, nloc]; row-major [S, nloc, 2o] here
        jt = np.asarray(self._j2_top).transpose(0, 2, 1)
        rloc = np.asarray(self._seg_col0)[:, None, None] + np.arange(jt.shape[1])[
            None, :, None
        ]
        gb = (np.arange(self.S) - 1)[:, None, None] * o + np.arange(2 * o)[
            None, None, :
        ]
        maskt = (
            (np.arange(jt.shape[1])[None, :, None] < np.asarray(self._seg_ncols)[:, None, None])
            & (gb >= 0) & (gb < m2) & (jt != 0.0)
        )
        trips.append(
            (
                np.broadcast_to(rloc, jt.shape)[maskt],
                m1 + np.broadcast_to(gb, jt.shape)[maskt],
                jt[maskt],
            )
        )

        cr = np.asarray(self._chain_r)  # [S, max_emit2, max_cols2]
        cg = self._chain_geom
        c0 = cg["cols"][:, None, None]
        er2 = cg["emit_rows"][:, None, None]
        nc2 = cg["ncols"][:, None, None]
        ri2 = np.arange(cr.shape[1])[None, :, None]
        ci2 = np.arange(cr.shape[2])[None, None, :]
        mask2 = (ri2 < er2) & (ci2 < nc2) & (ri2 <= ci2) & (cr != 0.0)
        trips.append(
            (
                m1 + np.broadcast_to(c0 + ri2, cr.shape)[mask2],
                m1 + np.broadcast_to(c0 + ci2, cr.shape)[mask2],
                cr[mask2],
            )
        )

        rows = np.concatenate([t[0] for t in trips])
        cols = np.concatenate([t[1] for t in trips])
        vals = np.concatenate([t[2] for t in trips])
        return SparseCSR.from_triplets(rows, cols, vals, (self._nrows, self.cols))

    def cols_permutation(self) -> Permutation:
        if self._delegate is not None:
            return self._delegate.cols_permutation()
        return self._cols_perm

    def rows_permutation(self) -> Permutation:
        if self._delegate is not None:
            return self._delegate.rows_permutation()
        return self._row_perm
