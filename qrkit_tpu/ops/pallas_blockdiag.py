"""Fused Pallas kernel: batched tiny-block QR + least-squares solve.

The flagship workload (BASELINE.json configs 1-2) is millions of tiny dense
blocks (2x1, 7x2).  The XLA path (vmapped compact-WY) is correct but pays for
multiple fused-loop passes over HBM; this kernel is the speed-of-light tier:

* **Tile-batched SoA layout**: the block batch lives structure-of-arrays as
  ``[br*bc, n]`` — lane-major, one block per (sublane, lane) slot.  Each grid
  step views every per-block scalar of the Householder recurrence as a full
  ``[8, 128]`` VPU tile (1024 blocks), so the unrolled recurrence runs at
  100% VPU occupancy with zero cross-lane communication.  (Round 1 used
  ``[1, TILE]`` rows — 1 of 8 sublanes busy — and measured ~7% of HBM
  bandwidth; this layout removes that 8x.)
* **Chunk-major AoSoA resident form** (round 3, the preferred hot-loop
  layout): ``[n/1024, br*bc, 8, 128]`` via :func:`to_aosoa` — one 1024-block
  chunk of ALL rows is contiguous, so every grid-step DMA is a single
  unstrided stream.  The flat SoA form's per-row stride grows with n and
  past ~500k blocks strided tile gathers lose HBM throughput (1M blocks:
  455 µs SoA vs 164 µs AoSoA; 10k: 3.6 vs 2.5 µs; ~69% of v5e HBM peak).
* **No relayout in the hot loop**: the ``*_soa`` entry points consume and
  produce SoA-resident operands, so an LM loop that keeps its Jacobian SoA
  (see ``functional.lm_damped_step_blockdiag1``) pays zero AoS<->SoA HBM
  round trips per iteration.  The AoS wrappers transpose once at the API
  boundary for drop-in compatibility.
* **Full fusion**: QR factorization, Qᵀb and the back-substitution run in one
  kernel; HBM traffic is exactly (inputs + x), nothing else is materialized.

This replaces the reference's per-block ``ColPivHouseholderQR`` loop
(/root/reference/src/QRKit/BlockDiagonalSparseQR.h:432-526) — the "native
kernel" tier of the framework (the reference's native tier is C++/Eigen).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "from_aosoa",
    "pallas_block_diagonal_lstsq",
    "pallas_block_diagonal_lstsq_aosoa",
    "pallas_block_diagonal_lstsq_soa",
    "pallas_block_diagonal_qr_r",
    "pallas_block_diagonal_qr_r_soa",
    "soa_pad",
    "to_aosoa",
]

_LANE = 128
_SUB = 8           # small-batch sublanes per grid step: one (8, 128) tile
_SUB_MID = 16      # mid tier: halves the grid-step count at 1024-granularity
_SUB_BIG = 32      # large-batch sublanes: 4x longer DMA chunks, 4x fewer steps
_STEP = _SUB * _LANE       # 1024 blocks per grid step (small batches)
_STEP_BIG = _SUB_BIG * _LANE  # 4096 (large batches)
_BIG_N = 65536     # batch-axis threshold above which the 4096 grid pays


def _sub_for(n: int) -> int:
    """Sublane tile for a padded batch axis: 32 when the axis tiles the big
    grid step (measured 18-28% faster at >= 500k blocks — fewer grid steps
    and 16 KB instead of 4 KB DMA chunks); small batches run the WHOLE axis
    as one grid step (total VMEM ≲ 1.5 MB at the 16k cap; per-step fixed
    cost beat DMA/compute pipelining at every tile tried on the 10k flagship
    point: sub 8/16/40/80 → 5.45/4.79/4.95/4.61 µs), else 16/8 by
    tiling granularity."""
    if n % _STEP_BIG == 0 and n >= _BIG_N:
        return _SUB_BIG
    if n // _LANE <= 128:
        return n // _LANE
    if n % (_SUB_MID * _LANE) == 0:
        return _SUB_MID
    return _SUB


def soa_pad(n: int) -> int:
    """Blocks are processed in (S, 128) VPU tiles; the SoA batch axis must be
    a multiple of 1024 (small batches) / 4096 (large, where the padding waste
    is negligible and the bigger grid step is measurably faster)."""
    step = _STEP_BIG if n > _BIG_N else _STEP
    return -(-n // step) * step


def _pad_soa_identity(a_soa: jnp.ndarray, bc: int, n: int) -> jnp.ndarray:
    """Pad the SoA batch axis with identity-ish blocks (unit diagonal) so the
    padded lanes never divide by zero."""
    np_ = soa_pad(n)
    if np_ == n:
        return a_soa
    e, dt = a_soa.shape[0], a_soa.dtype
    pad = jnp.zeros((e, np_ - n), dt)
    eye_rows = jnp.asarray([j * bc + j for j in range(bc)])
    pad = pad.at[eye_rows].set(1.0)
    return jnp.concatenate([a_soa, pad], axis=1)


def _pad_soa_zero(v_soa: jnp.ndarray, n: int) -> jnp.ndarray:
    np_ = soa_pad(n)
    if np_ == n:
        return v_soa
    return jnp.concatenate(
        [v_soa, jnp.zeros((v_soa.shape[0], np_ - n), v_soa.dtype)], axis=1
    )


def _householder_inplace(a, rhs_list, br: int, bc: int):
    """Unrolled Householder QR on per-element tiles ``a[r][c]``; each rhs in
    ``rhs_list`` (a list of lists of per-row tiles) is updated by Hᵀ too.

    Uses the unnormalized-reflector form ``H = I − u uᵀ / (β(β−x₀))`` with
    ``u = (x₀−β, a[j+1..])`` — ONE reciprocal per column instead of a
    per-element divide vector plus a tau divide (VPU divides are multi-cycle;
    at the 10k-block flagship point the kernel is compute-bound and the old
    form spent ~half its cycles in divides).  The eliminated column itself is
    never updated: only the diagonal survives into R/back-substitution, so it
    is written directly (β, or x₀ when the column is already zero)."""
    one = jnp.ones_like(a[0][0])
    for j in range(bc):
        x0 = a[j][j]
        sigma = jnp.zeros_like(x0)
        for r in range(j + 1, br):
            sigma = sigma + a[r][j] * a[r][j]
        norm = jnp.sqrt(x0 * x0 + sigma)
        beta = jnp.where(x0 >= 0, -norm, norm)
        degen = sigma <= 0
        # uᵀu = 2β(β−x₀); H = I − u uᵀ · c with c = 2/uᵀu = 1/(β(β−x₀))
        t = beta * (beta - x0)
        c_scale = jnp.where(degen, 0.0, one / jnp.where(degen, one, t))
        u = [None] * br
        u[j] = x0 - beta
        for r in range(j + 1, br):
            u[r] = a[r][j]
        a[j][j] = jnp.where(degen, x0, beta)
        # apply H to trailing columns and each rhs (column j is skipped: its
        # subdiagonal is annihilated by construction and never read again)
        for c in range(j + 1, bc):
            w = u[j] * a[j][c]
            for r in range(j + 1, br):
                w = w + u[r] * a[r][c]
            w = c_scale * w
            for r in range(j, br):
                a[r][c] = a[r][c] - u[r] * w
        for rhs in rhs_list:
            w = u[j] * rhs[j]
            for r in range(j + 1, br):
                w = w + u[r] * rhs[r]
            w = c_scale * w
            for r in range(j, br):
                rhs[r] = rhs[r] - u[r] * w


def _lstsq_kernel(
    br: int, bc: int, scaled: bool = False, stepnorm: bool = False,
    chunked: bool = False, delta: bool = False,
):
    """Fused QR + LS-solve kernel for static block shape (br, bc).

    Refs are [rows, 8, 128] (SoA: one full VPU tile per per-block scalar) or,
    with ``chunked=True``, [cps, rows, 8, 128] (AoSoA: ``cps`` contiguous
    1024-block chunks per grid step — every DMA is one unstrided stream; see
    :func:`pallas_block_diagonal_lstsq_aosoa`).
    ``scaled=True`` adds a leading (1, 1) SMEM scalar that multiplies the rhs
    on load — a data-dependent rhs costs zero extra HBM traffic (LM drivers
    use this; solving for s·b is s·x by linearity, so it composes with any
    caller-side rescale).
    ``stepnorm=True`` adds a trailing (1, 1) SMEM output accumulating
    ``Σ x²`` across grid steps — the LM trust-region step norm, produced
    while x is still in registers so a convergence check costs zero extra
    HBM reads (without it the caller re-reads the full x from HBM just to
    reduce it to one scalar).
    ``delta=True`` (chunked only) adds a trailing (1, 1, 128) VMEM input
    added to rhs row 0 on load — the cheapest data-dependency channel for
    chained solves: unlike the SMEM scalar path, whose staging measured
    ~0.9 µs of per-launch sync (SMEM round trip + the XLA carry fusion),
    a one-tile VMEM operand rides the normal vector dataflow and leaves
    the A/b streams dependency-free to overlap across launches (the
    10k-block flagship point: 2.9 → 1.9 µs per chained solve).
    """

    def kernel(*refs):
        refs = list(refs)
        s = refs.pop(0)[0, 0] if scaled else None
        sn_ref = refs.pop() if stepnorm else None
        d_ref = refs.pop(-2) if delta else None  # [a, b, delta, x]
        a_ref, b_ref, x_ref = refs
        if chunked:
            a = [[a_ref[:, r * bc + c] for c in range(bc)] for r in range(br)]
            rhs = [b_ref[:, r] for r in range(br)]
            if delta:
                rhs[0] = rhs[0] + d_ref[0]
        else:
            a = [[a_ref[r * bc + c] for c in range(bc)] for r in range(br)]
            rhs = [b_ref[r] for r in range(br)]
        _householder_inplace(a, [rhs], br, bc)
        # back substitution on the bc x bc upper-triangular R; the rhs scale
        # is applied to x (bc tiles) instead of b on load (br tiles) — by
        # linearity solve(s·b) = s·solve(b), and bc < br always here
        x = [None] * bc
        for j in range(bc - 1, -1, -1):
            acc = rhs[j]
            for c in range(j + 1, bc):
                acc = acc - a[j][c] * x[c]
            x[j] = acc / a[j][j]
        if scaled:
            x = [xj * s for xj in x]
        for j in range(bc):
            if chunked:
                x_ref[:, j] = x[j]
            else:
                x_ref[j] = x[j]
        if stepnorm:
            acc = jnp.sum(x[0] * x[0])
            for j in range(1, bc):
                acc = acc + jnp.sum(x[j] * x[j])

            @pl.when(pl.program_id(0) == 0)
            def _init():
                sn_ref[0, 0] = acc

            @pl.when(pl.program_id(0) != 0)
            def _accum():
                sn_ref[0, 0] = sn_ref[0, 0] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "sub", "stepnorm"))
def pallas_block_diagonal_lstsq_soa(
    a_soa: jnp.ndarray, b_soa: jnp.ndarray, interpret: bool = False,
    b_scale: jnp.ndarray | None = None, sub: int | None = None,
    stepnorm: bool = False,
) -> jnp.ndarray:
    """SoA-native fused QR + LS solve.

    ``a_soa`` is ``[br*bc, n]`` (entry (r, c) of block k at ``[r*bc+c, k]``),
    ``b_soa`` is ``[br, n]``; returns ``x_soa [bc, n]``.  ``n`` must be a
    multiple of :func:`soa_pad` granularity (1024) with padded lanes holding
    unit-diagonal blocks — callers keeping operands SoA-resident across an LM
    loop pad once with :func:`soa_pad`/``_pad_soa_identity`` and never
    relayout again.

    ``b_scale`` (optional device scalar) solves for ``b_scale · b_soa``
    without materializing the scaled rhs: the scalar rides in SMEM and scales
    tiles on load, so a data-dependent rhs adds zero HBM traffic.

    ``sub`` (static) overrides the sublanes-per-grid-step tile; ``n/128`` must
    be a multiple of it.  Default picks the measured-best tier for ``n``.

    ``stepnorm=True`` (static) returns ``(x_soa, Σ x²)`` with the step norm
    reduced in-kernel to a (1, 1) SMEM scalar — an LM driver's convergence /
    trust-region check at zero extra HBM traffic (padded lanes contribute
    exactly 0: unit-diagonal pad blocks see a zero rhs).
    """
    ebc, n = a_soa.shape
    br = b_soa.shape[0]
    bc = ebc // br
    if n % _STEP:
        raise ValueError(f"SoA batch axis {n} not a multiple of {_STEP}")
    if sub is None:
        sub = _sub_for(n)
    elif (n // _LANE) % sub:
        raise ValueError(f"sub={sub} does not tile the {n // _LANE} sublanes")
    dt = a_soa.dtype
    a3 = a_soa.reshape(ebc, n // _LANE, _LANE)
    b3 = b_soa.reshape(br, n // _LANE, _LANE)
    scaled = b_scale is not None
    in_specs = [
        pl.BlockSpec((ebc, sub, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((br, sub, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    args = (a3, b3)
    if scaled:
        in_specs.insert(
            0, pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        args = (jnp.asarray(b_scale, dt).reshape(1, 1),) + args
    out_shape = jax.ShapeDtypeStruct((bc, n // _LANE, _LANE), dt)
    out_specs = pl.BlockSpec(
        (bc, sub, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    if stepnorm:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), dt))
        out_specs = (
            out_specs,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        )
    out = pl.pallas_call(
        _lstsq_kernel(br, bc, scaled=scaled, stepnorm=stepnorm),
        out_shape=out_shape,
        grid=(n // (sub * _LANE),),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    if stepnorm:
        x3, sn = out
        return x3.reshape(bc, n), sn[0, 0]
    return out.reshape(bc, n)


def _cps_for(nchunks: int) -> int:
    """Chunks-per-grid-step tier for the AoSoA layout: small batches run the
    whole axis as ONE grid step (≤ 16 chunks ≈ 1.5 MB VMEM for a 7×2 system —
    per-step fixed cost beats DMA/compute pipelining there, as measured for
    the SoA tiers), else the largest of 10/8/5/4/2/1 that tiles the chunk
    count (cps=10 re-measured best in round 5 once the delta-tile dependency
    freed the streams to overlap: 0.93/0.96/0.94 of HBM peak at
    100k/500k/1M vs 0.64/0.87/0.88 at the old cps=4; ~920 KB contiguous DMA
    per operand per step).  Callers that control their own padding should
    pad the chunk count to a multiple of 10 (see bench.py)."""
    if nchunks <= 16:
        return nchunks
    for c in (10, 8, 5, 4, 2):
        if nchunks % c == 0:
            return c
    return 1


def to_aosoa(v_soa: jnp.ndarray) -> jnp.ndarray:
    """SoA ``[rows, n]`` → chunk-major AoSoA ``[n/1024, rows, 8, 128]``.

    One 1024-block chunk of ALL rows is contiguous, so a grid step's DMA is a
    single unstrided stream.  The SoA layout's per-row stride grows with n
    (n·4 bytes), and past ~500k blocks strided tile gathers measurably lose
    HBM throughput: on the 7×2 flagship the AoSoA kernel measured 2.5 µs at
    10k blocks (SoA 3.6), 82 µs at 500k (116) and 164 µs at 1M (455 — the SoA
    stride penalty doubled per-block cost from 500k to 1M; chunk-major holds
    0.16 ns/block, ~69% of v5e HBM peak, at both).  One-time relayout: do it
    OUTSIDE hot loops, like the AoS↔SoA boundary."""
    rows, n = v_soa.shape
    return jnp.moveaxis(v_soa.reshape(rows, n // _STEP, _SUB, _LANE), 0, 1)


def from_aosoa(v4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_aosoa`: ``[n/1024, rows, 8, 128]`` → ``[rows, n]``."""
    nch, rows = v4.shape[0], v4.shape[1]
    return jnp.moveaxis(v4, 1, 0).reshape(rows, nch * _STEP)


@functools.partial(
    jax.jit, static_argnames=("interpret", "cps", "stepnorm")
)
def pallas_block_diagonal_lstsq_aosoa(
    a4: jnp.ndarray, b4: jnp.ndarray, interpret: bool = False,
    b_scale: jnp.ndarray | None = None, cps: int | None = None,
    stepnorm: bool = False, b_delta: jnp.ndarray | None = None,
):
    """Chunk-major AoSoA fused QR + LS solve — the fastest layout at every
    measured batch size (see :func:`to_aosoa`).

    ``a4`` is ``[n/1024, br*bc, 8, 128]`` (``to_aosoa`` of the ``[br*bc, n]``
    SoA form), ``b4`` is ``[n/1024, br, 8, 128]``; returns ``x4
    [n/1024, bc, 8, 128]`` (and ``Σ x²`` with ``stepnorm=True``).  ``b_scale``
    and ``stepnorm`` behave exactly as in
    :func:`pallas_block_diagonal_lstsq_soa`.  ``cps`` (static) overrides the
    chunks-per-grid-step tier; it must tile ``n/1024``.

    ``b_delta`` (optional ``[1, 1, 128]`` device array) is added to rhs row
    0 of every chunk on load, through VMEM — the preferred data-dependency
    channel for chained solves: it skips the SMEM scalar staging (~0.9 µs
    of per-launch sync measured on the tunnel-attached v5e) and leaves the
    A/b streams free to overlap across launches (see ``_lstsq_kernel``).
    """
    nch, ebc = a4.shape[0], a4.shape[1]
    br = b4.shape[1]
    bc = ebc // br
    if cps is None:
        cps = _cps_for(nch)
    elif nch % cps:
        raise ValueError(f"cps={cps} does not tile the {nch} chunks")
    dt = a4.dtype
    scaled = b_scale is not None
    delta = b_delta is not None
    in_specs = [
        pl.BlockSpec(
            (cps, ebc, _SUB, _LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (cps, br, _SUB, _LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = (a4, b4)
    if delta:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, _LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        args = args + (jnp.asarray(b_delta, dt).reshape(1, 1, _LANE),)
    if scaled:
        in_specs.insert(
            0, pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        args = (jnp.asarray(b_scale, dt).reshape(1, 1),) + args
    out_shape = jax.ShapeDtypeStruct((nch, bc, _SUB, _LANE), dt)
    out_specs = pl.BlockSpec(
        (cps, bc, _SUB, _LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    if stepnorm:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), dt))
        out_specs = (
            out_specs,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        )
    out = pl.pallas_call(
        _lstsq_kernel(
            br, bc, scaled=scaled, stepnorm=stepnorm, chunked=True, delta=delta
        ),
        out_shape=out_shape,
        grid=(nch // cps,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    if stepnorm:
        return out[0], out[1][0, 0]
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_block_diagonal_lstsq(
    blocks: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Fused lane-batched QR + LS solve of a [nb, br, bc] block-diagonal system.

    Equivalent to :func:`qrkit_tpu.functional.block_diagonal_lstsq` (pivot=False)
    — returns x [nb*bc] minimizing ||A x - b|| blockwise.  AoS compatibility
    wrapper: relayouts at the boundary (to the chunk-major AoSoA form, the
    fastest at every measured size); hot loops should hold operands AoSoA and
    call :func:`pallas_block_diagonal_lstsq_aosoa` directly.
    """
    nb, br, bc = blocks.shape
    a_soa = jnp.transpose(blocks, (1, 2, 0)).reshape(br * bc, nb)
    b_soa = jnp.transpose(b[: nb * br].reshape(nb, br), (1, 0))
    a4 = to_aosoa(_pad_soa_identity(a_soa, bc, nb))
    b4 = to_aosoa(_pad_soa_zero(b_soa, nb))
    x4 = pallas_block_diagonal_lstsq_aosoa(a4, b4, interpret=interpret)
    return jnp.transpose(from_aosoa(x4)[:, :nb], (1, 0)).reshape(nb * bc)


def _qr_r_kernel(br: int, bc: int):
    def kernel(a_ref, r_ref):
        a = [[a_ref[r * bc + c] for c in range(bc)] for r in range(br)]
        _householder_inplace(a, [], br, bc)
        k = 0
        for j in range(bc):
            for c in range(j, bc):
                r_ref[k] = a[j][c]
                k += 1

    return kernel


@functools.partial(jax.jit, static_argnames=("br", "interpret"))
def pallas_block_diagonal_qr_r_soa(
    a_soa: jnp.ndarray, br: int, interpret: bool = False
) -> jnp.ndarray:
    """SoA-native R factors: ``a_soa [br*bc, n]`` → packed upper-triangular
    entries ``[bc*(bc+1)/2, n]`` in row-major (j, c>=j) order."""
    ebc, n = a_soa.shape
    bc = ebc // br
    ntri = bc * (bc + 1) // 2
    if n % _STEP:
        raise ValueError(f"SoA batch axis {n} not a multiple of {_STEP}")
    sub = _sub_for(n)
    dt = a_soa.dtype
    a3 = a_soa.reshape(ebc, n // _LANE, _LANE)
    r3 = pl.pallas_call(
        _qr_r_kernel(br, bc),
        out_shape=jax.ShapeDtypeStruct((ntri, n // _LANE, _LANE), dt),
        grid=(n // (sub * _LANE),),
        in_specs=[
            pl.BlockSpec((ebc, sub, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (ntri, sub, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(a3)
    return r3.reshape(ntri, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_block_diagonal_qr_r(
    blocks: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Lane-batched R factors of a [nb, br, bc] batch → packed [nb, bc*(bc+1)/2]
    upper-triangular entries in row-major (j, c>=j) order."""
    nb, br, bc = blocks.shape
    a_soa = jnp.transpose(blocks, (1, 2, 0)).reshape(br * bc, nb)
    a_soa = _pad_soa_identity(a_soa, bc, nb)
    r_soa = pallas_block_diagonal_qr_r_soa(a_soa, br, interpret=interpret)
    return jnp.transpose(r_soa[:, :nb], (1, 0))
