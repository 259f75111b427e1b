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

__all__ = [
    "pallas_segment_chains_soa",
    "pallas_segment_apply_w",
    "pallas_chain_qr",
    "seg_pad",
    "SEG_STEP",
]

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


def _apply_w_kernel(ma: int, mc: int, mca: int, kg: int, h: int, wrows: int):
    """Kernel body for the batched chain Qᵀ-apply (one (segment-tile, l) grid
    step): step ``l``'s phase-1 reflectors applied to ``ko`` operand columns,
    with the live work-vector region held POSITION-INDEXED in VMEM scratch
    ``W`` across the sequential ``l`` steps — the Pallas twin of the phase-2
    gap-mode streaming window apply
    (``solvers/segmented_apply._segment_apply_cols_stream_gap``).

    Position algebra (host-verified per segment by
    ``solvers/segmented_plan._p2w_sim_segment`` — any geometry the model
    can't represent falls back to the XLA apply): window row ``r`` of step
    ``l`` lives at work-vector position ``a_l + r`` (``r < mca``) or
    ``b_l + (r - mca)`` (``r >= mca``).  ``W``'s row index IS the position
    for positions ``< h`` (the region any head window reaches); rows at
    positions ``>= h`` never touch ``W`` — their slice lands in the
    never-written pad ``[h, wrows)`` (reads 0, writes predicated off) and
    their pristine value rides in via ``w_ref``.  ``W`` starts zero, so a
    position's FIRST toucher reads 0 from ``W`` plus its pristine operand
    value from ``w_ref`` (host gather puts it there exactly once); later
    touchers read the carried value from ``W`` (``w_ref`` holds 0).  Every
    step emits ALL ``ma`` post-transform rows; the host's last-writer map
    composes the final work vector from emissions alone.  Reflectors apply
    one-by-one (``w -= v·(tau·(vᵀw))``), compact-WY up to fp reassociation;
    inactive padded steps have ``tau = 0`` (phase-1 zeroes them) and are
    exact pass-throughs.  Qᵀ (forward) order only.

    Operand columns are processed ``kg`` at a time (a third grid dimension
    walks the ``ko/kg`` column groups) so W and the streamed operand blocks
    fit VMEM at any ``h``; each group is an independent pass over the chain
    (W resets at ``l == 0``), re-streaming Y once per group.

    Refs:
      ab_ref  [L, 2] SMEM            per-step (a_l, b_l) window starts (whole
                                     array resident — Mosaic rejects a (1, 2)
                                     SMEM block; indexed by program_id(2))
      y_ref   [1, ma*mc, 8, 128]     unit-diagonal Y of the step (phase-1 out)
      tau_ref [1, mc, 8, 128]        reflector taus
      w_ref   [1, 1, ma*kg, 8, 128]  first-touch pristine operand rows
      wq_ref  [1, 1, ma*kg, 8, 128]  post-transform window rows out
      W       [wrows*kg, 8, 128]     VMEM scratch, persists across l steps
    """

    def kernel(ab_ref, y_ref, tau_ref, w_ref, wq_ref, W):
        l = pl.program_id(2)

        @pl.when(l == 0)
        def _reset():
            W[...] = jnp.zeros(W.shape, W.dtype)

        a = ab_ref[l, 0]
        b = ab_ref[l, 1]
        ac = jnp.minimum(a, h) * kg
        bc = jnp.minimum(b, h) * kg
        nt = ma - mca
        hd = W[pl.ds(ac, mca * kg), :, :]
        tl = W[pl.ds(bc, nt * kg), :, :]
        w = [
            [
                (hd[r * kg + c] if r < mca else tl[(r - mca) * kg + c])
                + w_ref[0, 0, r * kg + c]
                for c in range(kg)
            ]
            for r in range(ma)
        ]
        zero = jnp.zeros_like(w[0][0])
        for j in range(mc):
            tau = tau_ref[0, j]
            v = [y_ref[0, r * mc + j] for r in range(ma)]
            for c in range(kg):
                s = zero
                for r in range(j, ma):
                    s = s + v[r] * w[r][c]
                s = tau * s
                for r in range(j, ma):
                    w[r][c] = w[r][c] - v[r] * s
        for r in range(ma):
            for c in range(kg):
                wq_ref[0, 0, r * kg + c] = w[r][c]
        # position-predicated write-back (UNCLAMPED positions: rows at >= h
        # keep the pad's old value — 0 — so the pad stays never-written)
        hd_new = jnp.stack(
            [
                jnp.where(a + r < h, w[r][c], hd[r * kg + c])
                for r in range(mca)
                for c in range(kg)
            ]
        )
        W[pl.ds(ac, mca * kg), :, :] = hd_new
        tl_new = jnp.stack(
            [
                jnp.where(b + (r - mca) < h, w[r][c], tl[(r - mca) * kg + c])
                for r in range(mca, ma)
                for c in range(kg)
            ]
        )
        W[pl.ds(bc, nt * kg), :, :] = tl_new

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("ma", "mc", "mca", "ko", "kg", "h", "wrows", "interpret"),
)
def pallas_segment_apply_w(
    y_soa: jnp.ndarray,  # [L, ma*mc, npad] phase-1 Y factors, SoA
    tau_soa: jnp.ndarray,  # [L, mc, npad]
    w_soa: jnp.ndarray,  # [L, ko//kg, ma*kg, npad] first-touch pristine rows
    ab: jnp.ndarray,  # [L, 2] int32 per-step window starts (a_l, b_l)
    *,
    ma: int,
    mc: int,
    mca: int,
    ko: int,
    kg: int,
    h: int,
    wrows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chain Qᵀ applied to ``ko`` operand columns of S independent segment
    chains, ONE kernel launch.  Returns ``wq_soa [L, ko//kg, ma*kg, npad]``
    — every step's post-transform window rows; the caller composes the
    final work vector with its host-built last-writer map
    (``solvers/segmented_plan.prepare_p2w``).  Replaces the per-step XLA
    window apply, whose ~0.2 ms/step dispatch latency dominated the
    segmented refactorize (p2slab: 6.9 of 9.9 ms at config 3 —
    BANDED_PERF.md); here each chain step is one grid index with the live
    region position-indexed in VMEM (see :func:`_apply_w_kernel`).
    Operand columns run ``kg`` per grid pass (``kg | ko``, picked by the
    plan gate so W fits VMEM)."""
    L, e, npad = y_soa.shape
    ncg = ko // kg
    if ncg * kg != ko:
        raise ValueError(f"kg {kg} does not divide ko {ko}")
    if e != ma * mc:
        raise ValueError(f"factor entry axis {e} != ma*mc = {ma * mc}")
    if w_soa.shape != (L, ncg, ma * kg, npad):
        raise ValueError(
            f"operand shape {w_soa.shape} != {(L, ncg, ma * kg, npad)}"
        )
    if ab.shape != (L, 2):
        raise ValueError(f"ab shape {ab.shape} != {(L, 2)}")
    if npad % SEG_STEP:
        raise ValueError(f"segment axis {npad} not a multiple of {SEG_STEP}")
    if wrows < h + max(ma - mca, mca):
        raise ValueError(f"wrows {wrows} < h + max(ma-mca, mca)")
    dt = y_soa.dtype
    nt = npad // _LANE
    y4 = y_soa.reshape(L, e, nt, _LANE)
    t4 = tau_soa.reshape(L, mc, nt, _LANE)
    w5 = w_soa.reshape(L, ncg, ma * kg, nt, _LANE)
    grid = (npad // SEG_STEP, ncg, L)
    spec = lambda k: pl.BlockSpec(
        (1, k, _SUB, _LANE),
        lambda i, c, l: (l, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec(
        (1, 1, ma * kg, _SUB, _LANE),
        lambda i, c, l: (l, c, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    abspec = pl.BlockSpec(
        (L, 2), lambda i, c, l: (0, 0), memory_space=pltpu.SMEM
    )
    wq5 = pl.pallas_call(
        _apply_w_kernel(ma, mc, mca, kg, h, wrows),
        out_shape=jax.ShapeDtypeStruct((L, ncg, ma * kg, nt, _LANE), dt),
        grid=grid,
        in_specs=[abspec, spec(ma * mc), spec(mc), wspec],
        out_specs=wspec,
        scratch_shapes=[pltpu.VMEM((wrows * kg, _SUB, _LANE), dt)],
        interpret=interpret,
    )(ab.astype(jnp.int32), y4, t4, w5)
    return wq5.reshape(L, ncg, ma * kg, npad)


def _seq_chain_kernel(
    ma: int, mc: int, mca: int, me: int, ci: int, ci0: int, nsub: int
):
    """Kernel body for ONE sequential banded chain, ``nsub`` steps per grid
    index, operands in X-layout (``X[c, r] = A[r, c]`` — panel rows in lanes,
    so every reflector reduction runs along the fast axis).

    Refs:
      p_ref   [1, nsub, mc, ma]   shifted panels, X-layout
      act_ref [1, nsub]           1.0 = active step
      y_ref   [1, nsub, mc, ma]   unit-diagonal Y (X-layout) out
      tau_ref [1, nsub, mc]       reflector taus out
      v_ref   [1, nsub, mc, me]   triu(R)[:me] (X-layout) out
      carry   [mc, mca]           VMEM scratch (X-layout), persists over grid
    """

    def kernel(p_ref, act_ref, y_ref, tau_ref, v_ref, carry):
        @pl.when(pl.program_id(0) == 0)
        def _reset():
            carry[...] = jnp.zeros(carry.shape, carry.dtype)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ma), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (mc, 1), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (mc, ma), 1)
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (mc, ma), 0)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, mc), 1)
        for b in range(nsub):
            act = act_ref[0, 0, b] > 0.5
            cold = carry[...]  # [mc, mca]
            X = p_ref[0, b]  # [mc, ma]
            X = X + jnp.pad(cold, ((0, 0), (0, ma - mca)))
            one = jnp.ones((1, 1), X.dtype)
            zero = jnp.zeros((1, 1), X.dtype)
            Y = jnp.zeros((mc, ma), X.dtype)
            tau_row = jnp.zeros((1, mc), X.dtype)
            # unrolled Householder QR, Eigen/_householder_column conventions
            # (identical formulas to _chain_kernel above, scalars as [1, 1];
            # Y/taus accumulate via row masks — Mosaic cannot concat the
            # offset-layout scalar tiles)
            for j in range(mc):
                row = X[j : j + 1, :]  # column j of A
                x0 = row[:, j : j + 1]
                sigma = jnp.sum(
                    jnp.where(lane > j, row * row, 0.0), axis=1, keepdims=True
                )
                norm = jnp.sqrt(x0 * x0 + sigma)
                beta = jnp.where(x0 >= 0, -norm, norm)
                degen = sigma <= 0
                denom = jnp.where(degen, one, x0 - beta)
                safe_beta = jnp.where(norm == 0, one, beta)
                tau = jnp.where(degen, zero, (beta - x0) / safe_beta)
                v = jnp.where(
                    lane == j, one, jnp.where(lane > j, row / denom, 0.0)
                )  # [1, ma]
                w = tau * jnp.sum(X * v, axis=1, keepdims=True)  # [mc, 1]
                w = jnp.where(sub >= j, w, 0.0)
                X = X - w * v
                Y = jnp.where(sub2 == j, v, Y)
                tau_row = jnp.where(lane_c == j, tau, tau_row)
            azero = jnp.zeros((), X.dtype)
            y_ref[0, b] = jnp.where(act, Y, azero)
            tau_ref[0, b] = jnp.where(act, tau_row, azero)
            # triu(R)[:me] in X-layout: entry [c, r] = R[r, c], r <= c
            tri = jnp.where(lane2 <= sub2, X, azero)
            v_ref[0, b] = jnp.where(act, tri[:, :me], azero)
            # next carry = triu(R)[cix:cix+mca, cix:cix+mc] (X-layout slice);
            # the chain's FIRST step may use a distinct increment ci0 — only
            # sub-step 0 of grid step 0 can be it, so only b == 0 pays the
            # double slice + select
            def cut(cix):
                trip = jnp.pad(
                    tri, ((0, cix), (0, max(0, cix + mca - ma)))
                )
                return jax.lax.slice(
                    trip, (cix, cix), (cix + mc, cix + mca)
                )

            blk = cut(ci)
            if b == 0 and ci0 != ci:
                blk = jnp.where(pl.program_id(0) == 0, cut(ci0), blk)
            carry[...] = jnp.where(act, blk, cold)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("ma", "mc", "mca", "me", "ci", "ci0", "nsub", "interpret"),
)
def pallas_chain_qr(
    panels_t: jnp.ndarray,  # [nbp, mc, ma] shifted panels, X-layout
    act: jnp.ndarray,  # [nbp] 1.0/0.0 step activity
    *,
    ma: int,
    mc: int,
    mca: int,
    me: int,
    ci: int,
    ci0: int | None = None,
    nsub: int = 8,
    interpret: bool = False,
):
    """ONE sequential banded chain of ``nbp`` steps as a single kernel launch.

    The ``lax.scan`` form of the chain (``_banded_factorize_chunk``) launches
    dozens of tiny fused kernels per step — per-step dispatch latency, not
    math, dominates long chains (the 625-segment boundary chain of the 20k
    segmented factorize: ~10 ms; a 20k-block plain chain: ~1.5 s).  Here the
    whole chain is one ``pallas_call`` with the R-overlap carry in VMEM
    scratch across a sequential grid (``nsub`` chain steps per grid index to
    amortize block DMA), so per-step cost is a few microseconds of VPU work.

    Uniform-geometry contract (caller gates, else keep the XLA scan):
    ``col_inc[l] == ci`` for ``0 < l < nb-1`` with an optional distinct
    first-step ``ci0`` (the LAST step's carry cut is dead, and the carry
    ADD is statically ``[:mca]`` exactly like the XLA chunk — per-step
    carry depths only shift the panels, which the caller folds into its
    gather map).  ``nbp`` must be a multiple of ``nsub`` (pad, ``act=0``).

    Returns ``(y_t [nbp, mc, ma], taus [nbp, mc], v_t [nbp, mc, me])`` in
    X-layout (``y_t[l, c, r]`` = Y[r, c]), matching the scan's per-step
    ``(Y, taus, triu(R)[:me])`` exactly (inactive steps zeroed)."""
    nbp = panels_t.shape[0]
    if nbp % nsub:
        raise ValueError(f"nbp {nbp} not a multiple of nsub {nsub}")
    if ci0 is None:
        ci0 = ci
    dt = panels_t.dtype
    p4 = panels_t.reshape(nbp // nsub, nsub, mc, ma)
    a2 = act.astype(dt).reshape(nbp // nsub, 1, nsub)
    grid = (nbp // nsub,)
    spec = lambda *dims: pl.BlockSpec(
        (1, *dims), lambda i: (i,) + (0,) * len(dims), memory_space=pltpu.VMEM
    )
    aspec = pl.BlockSpec(
        (1, 1, nsub), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    y4, t2, v4 = pl.pallas_call(
        _seq_chain_kernel(ma, mc, mca, me, ci, ci0, nsub),
        out_shape=(
            jax.ShapeDtypeStruct((nbp // nsub, nsub, mc, ma), dt),
            jax.ShapeDtypeStruct((nbp // nsub, nsub, 1, mc), dt),
            jax.ShapeDtypeStruct((nbp // nsub, nsub, mc, me), dt),
        ),
        grid=grid,
        in_specs=[spec(nsub, mc, ma), aspec],
        out_specs=(spec(nsub, mc, ma), spec(nsub, 1, mc), spec(nsub, mc, me)),
        scratch_shapes=[pltpu.VMEM((mc, mca), dt)],
        interpret=interpret,
    )(p4, a2)
    return (
        y4.reshape(nbp, mc, ma),
        t2.reshape(nbp, mc),
        v4.reshape(nbp, mc, me),
    )


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
