"""Sequence-of-compact-WY-blocks implicit Q (the SparseBlockYTY analog).

TPU-native re-design of the reference's ``SparseBlockYTY`` + ``sequenceYTY``
fused product (/root/reference/src/QRKit/SparseBlockYTY.h:69-144, BlockYTY.h):

* Each block k applies ``w += Y_k ((T_k or T_kᵀ) (Y_kᵀ w))`` to a *window* of the
  operand starting at row ``start[k]``.
* The reference's 2-segment gather/scatter (diagonal part + subdiagonal part
  separated by ``numZeros`` gap rows, SparseQRUtils.h:44-89) is replaced by
  storing ``Y`` in **window coordinates with explicit zero rows in the gap** —
  zero rows touch nothing, so a contiguous ``dynamic_slice`` window replaces the
  gather/scatter entirely.  That trades a few FLOPs for XLA-friendly contiguous
  access.
* ``Qᵀ`` is a forward ``lax.scan``; ``Q`` a reverse scan (SparseBlockYTY.h:112-138).
* The reference's OpenMP loop over RHS columns (BandedBlockedSparseQR.h:557,614)
  disappears: the operand is a whole [m, k] matrix and every step is 3 matmuls.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .householder import highest_precision

__all__ = ["CompactWYSeq"]


@functools.partial(jax.jit, static_argnames=("transpose", "vec"))
@highest_precision
def _apply_seq(seq: "CompactWYSeq", M: jnp.ndarray, transpose: bool, vec: bool):
    if vec:
        M = M[:, None]
    k = M.shape[1]
    W = seq.window
    Mp = jnp.concatenate([M, jnp.zeros((W, k), M.dtype)], axis=0)

    def body(carry, blk):
        Yk, Tk, sk = blk
        zero = jnp.zeros((), sk.dtype)
        w = jax.lax.dynamic_slice(carry, (sk, zero), (W, k))
        Tt = Tk.T if transpose else Tk
        w = w + Yk @ (Tt @ (Yk.T @ w))
        carry = jax.lax.dynamic_update_slice(carry, w, (sk, zero))
        return carry, None

    out, _ = jax.lax.scan(
        body, Mp, (seq.Y, seq.T, seq.start), reverse=not transpose
    )
    out = out[: seq.m]
    return out[:, 0] if vec else out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CompactWYSeq:
    """Stacked compact-WY blocks: Y [nb, W, C], T [nb, C, C], start [nb].

    ``m`` is the logical operand length (static).  Window height W and panel
    width C are the padded maxima over blocks; padding rows/cols of Y and T are
    zero so padded blocks act as identity on the padded region.
    """

    Y: jnp.ndarray
    T: jnp.ndarray
    start: jnp.ndarray
    m: int

    def tree_flatten(self):
        return (self.Y, self.T, self.start), (self.m,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, m=aux[0])

    @property
    def num_blocks(self) -> int:
        return self.Y.shape[0]

    @property
    def window(self) -> int:
        return self.Y.shape[1]

    def _apply(self, M: jnp.ndarray, transpose: bool) -> jnp.ndarray:
        return _apply_seq(self, M, transpose, M.ndim == 1)

    def apply_q(self, M: jnp.ndarray) -> jnp.ndarray:
        """Q · M — reverse-order block product (SparseBlockYTY.h:126-138)."""
        return self._apply(M, transpose=False)

    def apply_qt(self, M: jnp.ndarray) -> jnp.ndarray:
        """Qᵀ · M — forward-order transposed product (SparseBlockYTY.h:112-124)."""
        return self._apply(M, transpose=True)

    def to_dense_q(self) -> jnp.ndarray:
        """Explicit dense Q [m, m] (parity/testing; the reference materializes
        sparse Q the same way, via Q * I — BandedBlockedSparseQR.h:741-765)."""
        return self.apply_q(jnp.eye(self.m, dtype=self.Y.dtype))

    def to_sparse_q(self, chunk: int = 512, drop_tol: float = 0.0):
        """Explicit *sparse* Q assembled by blocked application to unit-column
        slabs (the Q·I product of BandedBlockedSparseQR.h:741-765, chunked).

        Peak device memory is O(m·chunk) — never an [m, m] array; host memory
        is O(nnz(Q)).  ``drop_tol`` prunes entries with |v| <= drop_tol (0.0
        keeps every structurally-touched entry, matching the reference's
        exact-zero pruning).  Note a chained (overlapping) sequence genuinely
        fills Q's upper profile — nnz(Q) here equals the reference's.
        """
        import numpy as np

        from ..sparse import SparseCSR

        m = self.m
        rows_l, cols_l, vals_l = [], [], []
        eye_slab = jnp.eye(m, min(chunk, m), dtype=self.Y.dtype)
        for c0 in range(0, m, chunk):
            k = min(chunk, m - c0)
            # columns e_{c0}..e_{c0+k-1}; no wraparound since i < k <= m - c0
            slab = jnp.roll(eye_slab, c0, axis=0)[:, :k]
            q_slab = np.asarray(self.apply_q(slab))
            r, c = np.nonzero(np.abs(q_slab) > drop_tol)
            rows_l.append(r)
            cols_l.append(c + c0)
            vals_l.append(q_slab[r, c])
        return SparseCSR.from_triplets(
            np.concatenate(rows_l), np.concatenate(cols_l), np.concatenate(vals_l),
            (m, m),
        )

    @staticmethod
    def single(Y: jnp.ndarray, T: jnp.ndarray, start: int, m: int) -> "CompactWYSeq":
        return CompactWYSeq(
            Y[None], T[None], jnp.asarray([start], dtype=jnp.int32), m
        )

    @staticmethod
    def concat(a: "CompactWYSeq", b: "CompactWYSeq") -> "CompactWYSeq":
        """Concatenate two sequences (a's blocks applied first for Qᵀ).

        Pads both to the common window/panel sizes.  Used by composite solvers.
        """
        assert a.m == b.m
        W = max(a.window, b.window)
        C = max(a.Y.shape[2], b.Y.shape[2])

        def pad(seq):
            Y = jnp.zeros((seq.num_blocks, W, C), seq.Y.dtype)
            Y = Y.at[:, : seq.window, : seq.Y.shape[2]].set(seq.Y)
            T = jnp.zeros((seq.num_blocks, C, C), seq.T.dtype)
            T = T.at[:, : seq.T.shape[1], : seq.T.shape[2]].set(seq.T)
            return Y, T

        Ya, Ta = pad(a)
        Yb, Tb = pad(b)
        return CompactWYSeq(
            jnp.concatenate([Ya, Yb]),
            jnp.concatenate([Ta, Tb]),
            jnp.concatenate([a.start, b.start]),
            a.m,
        )
