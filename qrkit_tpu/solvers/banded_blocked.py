"""Banded-blocked QR — the sequential chain as a ``lax.scan``.

TPU-native re-design of ``BandedBlockedSparseQR``
(/root/reference/src/QRKit/BandedBlockedSparseQR.h:122-519).  The reference's
sequential left-to-right block loop carries the unsolved overlap columns of each
block's R into the next block's panel (BandedBlockedSparseQR.h:494-507); here
that carry is literally the ``lax.scan`` carry.  Per step: assemble the panel
(carry on top, matrix rows below), compact-WY panel QR, emit solved R rows, and
shift out the next overlap carry.  Q is implicit — a
:class:`~qrkit_tpu.ops.compact_wy.CompactWYSeq` whose per-block windows encode
the reference's diagonal/subdiagonal segments with ``numZeros`` gap rows
(BlockYTY.h:77-139) as explicit zero rows.

All geometry (active rows, overlaps, gaps) comes from the static
:class:`~qrkit_tpu.plan.StructurePlan`; the jitted factorization is keyed by the
padded maxima, so LM-style repeated factorizations of one structure compile once.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis import as_banded_as_possible, block_banded_info, from_block_banded_pattern
from ..ops.compact_wy import CompactWYSeq
from ..ops.householder import highest_precision, panel_qr_yt
from ..plan import StructurePlan
from ..sparse import Permutation, SparseCSR
from .base import ComputationInfo, QRSolver

__all__ = ["BandedBlockedQR", "banded_geometry", "banded_factorize", "banded_solve_r"]


def banded_geometry(plan: StructurePlan):
    """Derive per-step scan geometry from the plan.

    Mirrors the loop bookkeeping of BandedBlockedSparseQR.h:457-507:
    ``carry_rows[i]`` = rows of previous R carried into step i,
    ``col_inc[i]``    = column shift applied to produce the next carry,
    ``num_zeros[i]``  = gap rows between the YTY diagonal and subdiagonal parts,
    ``emit_rows[i]``  = R rows owned by block i.
    """
    nb = plan.num_blocks
    rows_, cols_, nrows_, ncols_ = plan.as_arrays()
    carry_rows = np.zeros(nb, dtype=np.int64)
    num_zeros = np.zeros(nb, dtype=np.int64)
    col_inc = np.zeros(nb, dtype=np.int64)
    active = np.zeros(nb, dtype=np.int64)
    active[0] = nrows_[0]
    for i in range(nb - 1):
        overlap = (cols_[i] + ncols_[i]) - cols_[i + 1]
        ci = ncols_[i] - overlap
        col_inc[i] = ci
        carry_rows[i + 1] = nrows_[i] - ci
        active[i + 1] = nrows_[i] + nrows_[i + 1] - ci
        nz = (rows_[i + 1] + nrows_[i + 1]) - active[i + 1] - cols_[i + 1]
        num_zeros[i + 1] = max(nz, 0)
    solved = np.asarray(plan.solved_rows(), dtype=np.int64)
    emit_rows = np.minimum(solved, ncols_)
    return {
        "carry_rows": carry_rows,
        "col_inc": col_inc,
        "num_zeros": num_zeros,
        "active": active,
        "emit_rows": emit_rows,
        "nrows": nrows_,
        "ncols": ncols_,
        "cols": cols_,
        "rows": rows_,
    }


@functools.partial(
    jax.jit,
    static_argnames=("max_active", "max_cols", "max_carry", "max_zeros", "max_emit", "m"),
)
@highest_precision
def banded_factorize(
    panels: jnp.ndarray,  # [nb, mR, max_cols] dense blocks of the permuted matrix
    geom: dict,  # int32 arrays [nb]: carry_rows, col_inc, num_zeros, ncols, nrows, cols
    *,
    max_active: int,
    max_cols: int,
    max_carry: int,
    max_zeros: int,
    max_emit: int,
    m: int,
):
    """The scan over blocks.  Returns (CompactWYSeq, R panels [nb, max_emit, max_cols])."""
    nb, mR, _ = panels.shape
    dt = panels.dtype
    W = max_active + max_zeros

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (max_active,), 0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (W,), 0)
    carry_r_iota = jax.lax.broadcasted_iota(jnp.int32, (max_carry,), 0)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (max_cols,), 0)

    def body(carry, xs):
        C = carry  # [max_carry, max_cols] previous overlap block of R
        panel, carry_rows, col_inc, num_zeros, ncols, nrows = xs

        # ---- assemble Ji: carry on top, matrix rows shifted down (ref :494-507) ----
        Ji = jnp.zeros((max_active, max_cols), dt)
        Ji = Ji.at[:max_carry].set(C)
        src = rows_iota - carry_rows
        valid = (src >= 0) & (src < nrows)
        src_c = jnp.clip(src, 0, mR - 1)
        Ji = Ji + jnp.where(valid[:, None], panel[src_c], jnp.zeros((), dt))

        # ---- compact-WY panel QR (ref :468-477) ------------------------------------
        Y, T, V = panel_qr_yt(Ji)
        V = jnp.triu(V)

        # ---- YTY window: insert num_zeros gap rows after the diagonal part ---------
        wsrc = jnp.where(w_iota < ncols, w_iota, w_iota - num_zeros)
        wvalid = ((w_iota < ncols) | (w_iota >= ncols + num_zeros)) & (
            wsrc < max_active
        )
        Yw = jnp.where(wvalid[:, None], Y[jnp.clip(wsrc, 0, max_active - 1)], jnp.zeros((), dt))

        # ---- next carry: shifted overlap of V (ref :494-507) -----------------------
        rsrc = carry_r_iota + col_inc
        csrc = cols_iota + col_inc
        next_rows = nrows - col_inc  # rows_i - colIncrement
        cvalid = (carry_r_iota < next_rows)[:, None] & (csrc < ncols)[None, :]
        Cn = jnp.where(
            cvalid,
            V[jnp.clip(rsrc, 0, max_active - 1)][:, jnp.clip(csrc, 0, max_cols - 1)],
            jnp.zeros((), dt),
        )

        return Cn, (Yw, T, V[:max_emit])

    C0 = jnp.zeros((max_carry, max_cols), dt)
    xs = (
        panels,
        geom["carry_rows"].astype(jnp.int32),
        geom["col_inc"].astype(jnp.int32),
        geom["num_zeros"].astype(jnp.int32),
        geom["ncols"].astype(jnp.int32),
        geom["nrows"].astype(jnp.int32),
    )
    _, (Yws, Ts, Vs) = jax.lax.scan(body, C0, xs)

    seq = CompactWYSeq(Yws, Ts, geom["cols"].astype(jnp.int32), m)
    return seq, Vs


@functools.partial(jax.jit, static_argnames=("max_emit", "max_cols", "n"))
@highest_precision
def banded_solve_r(
    r_panels: jnp.ndarray,  # [nb, max_emit, max_cols]
    cols: jnp.ndarray,  # [nb] block col offsets
    emit_rows: jnp.ndarray,  # [nb]
    ncols_arr: jnp.ndarray,  # [nb]
    y: jnp.ndarray,  # [n]
    *,
    max_emit: int,
    max_cols: int,
    n: int,
):
    """Blocked back-substitution: reverse scan over blocks.

    Solves R x = y with the banded upper-triangular R stored as per-block
    panels, without ever materializing R — each step is one [max_emit]²
    triangular solve plus a small matvec against already-solved x entries.
    """
    dt = r_panels.dtype
    xpad = jnp.zeros((n + max_cols,), dt)
    ypad = jnp.concatenate([y, jnp.zeros((max_cols,), dt)])
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (max_emit,), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (max_cols,), 0)
    eye = jnp.eye(max_emit, dtype=dt)

    def body(xcarry, xs):
        V, c0, er, nc = xs
        zero = jnp.zeros((), c0.dtype)
        # subtract known-x contributions from overlap columns j in [er, nc)
        xwin = jax.lax.dynamic_slice(xcarry, (c0,), (max_cols,))
        maskj = (c_iota >= er) & (c_iota < nc)
        rhs_sub = V[:max_emit] @ jnp.where(maskj, xwin, jnp.zeros((), dt))
        yblk = jax.lax.dynamic_slice(ypad, (c0,), (max_emit,))
        rhs = jnp.where(r_iota < er, yblk - rhs_sub, jnp.zeros((), dt))
        # masked triangular block: padded rows/cols become identity
        live = (r_iota < er)[:, None] & (r_iota < er)[None, :]
        U = jnp.where(live, V[:max_emit, :max_emit], eye)
        xblk = jax.lax.linalg.triangular_solve(
            U, rhs[:, None], left_side=True, lower=False
        )[:, 0]
        old = jax.lax.dynamic_slice(xcarry, (c0,), (max_emit,))
        new = jnp.where(r_iota < er, xblk, old)
        xcarry = jax.lax.dynamic_update_slice(xcarry, new, (c0,))
        return xcarry, None

    xs = (r_panels, cols.astype(jnp.int32), emit_rows.astype(jnp.int32), ncols_arr.astype(jnp.int32))
    xpad, _ = jax.lax.scan(body, xpad, xs, reverse=True)
    return xpad[:n]


class BandedBlockedQR(QRSolver):
    """QR of a (row-permuted) block-banded sparse matrix.

    ``block_rows/block_cols/block_overlap`` given → static known pattern
    (the fixed-size-block fast path, BandedBlockedSparseQR.h:398-408); otherwise
    analyzePattern does abap row ordering + block detection (:417-426).
    """

    def __init__(
        self,
        block_rows: Optional[int] = None,
        block_cols: Optional[int] = None,
        block_overlap: Optional[int] = None,
        suggested_block_cols: int = 2,
    ):
        self._static = block_rows is not None and block_cols is not None and block_overlap is not None
        self._brows = block_rows
        self._bcols = block_cols
        self._boverlap = block_overlap
        self._suggested = suggested_block_cols
        self._analysis_ok = False

    @property
    def rows(self) -> int:
        return self._nrows

    @property
    def cols(self) -> int:
        return self._ncols

    def analyze_pattern(self, mat: SparseCSR):
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
        self.geom = banded_geometry(self.plan)
        g = self.geom
        self._max_active = int(g["active"].max())
        self._max_cols = int(g["ncols"].max())
        self._max_carry = max(int(g["carry_rows"].max()), 1)
        self._max_zeros = int(g["num_zeros"].max())
        self._max_emit = int(g["emit_rows"].max())
        self._mR = int(g["nrows"].max())
        self._analysis_ok = True
        return self

    def compute(self, mat: SparseCSR, force_pattern_analysis: bool = False):
        if not self._analysis_ok or force_pattern_analysis:
            self.analyze_pattern(mat)
        pmat = (
            mat.permute_rows(self._row_perm)
            if not self._row_perm.is_identity()
            else mat
        )
        g = self.geom
        panels = pmat.blocks_dense(
            [b.astuple() for b in self.plan.blocks], self._mR, self._max_cols
        )
        geom_dev = {
            k: jnp.asarray(g[k]) for k in ("carry_rows", "col_inc", "num_zeros", "ncols", "nrows", "cols")
        }
        self.q_seq, self.r_panels = banded_factorize(
            jnp.asarray(panels),
            geom_dev,
            max_active=self._max_active,
            max_cols=self._max_cols,
            max_carry=self._max_carry,
            max_zeros=self._max_zeros,
            max_emit=self._max_emit,
            m=self._nrows,
        )
        self._info = ComputationInfo.SUCCESS
        return self

    # --- Q / R ----------------------------------------------------------------------
    def apply_q(self, m: jnp.ndarray) -> jnp.ndarray:
        return self.q_seq.apply_q(m)

    def apply_qt(self, m: jnp.ndarray) -> jnp.ndarray:
        return self.q_seq.apply_qt(m)

    def matrix_r_dense(self) -> jnp.ndarray:
        g = self.geom
        R = np.zeros((self._nrows, self._ncols), dtype=np.asarray(self.r_panels).dtype)
        panels = np.asarray(self.r_panels)
        for i, b in enumerate(self.plan.blocks):
            er = int(g["emit_rows"][i])
            nc = int(g["ncols"][i])
            R[b.col : b.col + er, b.col : b.col + nc] = panels[i, :er, :nc]
        return jnp.asarray(R)

    def solve_r(self, y: jnp.ndarray) -> jnp.ndarray:
        g = self.geom
        return banded_solve_r(
            self.r_panels,
            jnp.asarray(g["cols"]),
            jnp.asarray(g["emit_rows"]),
            jnp.asarray(g["ncols"]),
            y,
            max_emit=self._max_emit,
            max_cols=self._max_cols,
            n=self._ncols,
        )

    def rows_permutation(self) -> Permutation:
        return self._row_perm
