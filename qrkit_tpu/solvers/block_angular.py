"""Block-angular ``[A1 | A2]`` QR — solver composition.

TPU-native re-design of ``BlockAngularSparseQR``
(/root/reference/src/QRKit/BlockAngularSparseQR.h:79-514).  The reference
composes a left and right solver via C++ template parameters; here it is plain
object composition over the :class:`~qrkit_tpu.solvers.base.QRSolver` protocol:

1. left.compute(A1)                                         (:472)
2. J2 ← Q1ᵀ (P_row_left · A2)   — one implicit-Q matrix product (:485, :360-397)
3. right.compute(J2[m1:])                                   (:368)
4. R = [[R1, J2top·P2], [0, R2]]  assembled lazily           (:495, :284-335)
5. column/row permutations composed from both sub-solvers    (:497-508)

Q is never formed: ``apply_qt`` runs Q1ᵀ then (P_r2, Q2ᵀ) on the bottom rows;
``apply_q`` the reverse (:532-649).  ``solve`` eliminates the right block first,
then back-substitutes through the left solver's *structured* R — no dense
composite R is ever built on the solve path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..containers import BlockMatrix1x2
from ..ops.householder import highest_precision
from ..sparse import Permutation, SparseCSR
from .base import ComputationInfo, QRSolver

__all__ = ["BlockAngularQR"]


def _to_device_dense(block) -> jnp.ndarray:
    if isinstance(block, SparseCSR):
        return jnp.asarray(block.to_dense())
    return jnp.asarray(block)


class BlockAngularQR(QRSolver):
    """QR of ``[A1 | A2]`` parameterized by left/right sub-solvers.

    ``left_solver`` factors A1 (easy/structured); ``right_solver`` factors the
    dense-ish ``Q1ᵀA2`` bottom rows.  Any :class:`QRSolver` works on either side
    — the reference's template composition as Python composition.
    """

    def __init__(self, left_solver: QRSolver, right_solver: QRSolver):
        self.left = left_solver
        self.right = right_solver

    @property
    def rows(self) -> int:
        return self._n1

    @property
    def cols(self) -> int:
        return self._m1 + self._m2

    @property
    def rank(self) -> int:
        return self.left.rank + self.right.rank

    def compute(self, mat: BlockMatrix1x2) -> "BlockAngularQR":
        # the left block should be the bigger one (BlockAngularSparseQR.h:434)
        assert mat.left_cols > mat.right_cols
        assert mat.left_rows == mat.right_rows
        self._m1 = mat.left_cols
        self._m2 = mat.right_cols
        self._n1 = mat.left_rows

        # 1) left factorization
        self.left.compute(mat.left)

        # 2) J2 = Q1ᵀ (P_row_left A2) — the solveRightBlock step
        a2 = _to_device_dense(mat.right)
        lperm = self.left.rows_permutation()
        if not lperm.is_identity():
            a2 = a2[jnp.asarray(lperm.gather_indices())]
        j2 = self.left.apply_qt(a2)
        self._j2_top = j2[: self._m1]

        # 3) right factorization on the lower rows
        self.right.compute(j2[self._m1 :])

        # 4) R top-right block with the right solver's column ordering applied
        sigma2 = jnp.asarray(self.right.cols_permutation().indices)
        self._r12 = self._j2_top[:, sigma2]

        # 5) composed permutations
        s1 = self.left.cols_permutation().indices
        s2 = self.right.cols_permutation().indices
        self._cols_perm = Permutation(
            np.concatenate([s1, self._m1 + np.asarray(s2)])
        )
        rp = np.arange(self._n1, dtype=np.int64)
        rp[: self.left.rows] = self.left.rows_permutation().indices
        self._rows_perm = Permutation(rp)

        self._set_success()
        return self

    def r_diagonal(self) -> jnp.ndarray:
        """diag(R) of the composite = [diag(R1) | diag(R2)]."""
        return jnp.concatenate(
            [
                self.left.r_diagonal()[: self._m1],
                self.right.r_diagonal()[: self._m2],
            ]
        )

    # --- implicit Q (BlockAngularSparseQR.h:532-649) --------------------------------
    def apply_qt(self, m: jnp.ndarray) -> jnp.ndarray:
        vec = m.ndim == 1
        m2d = m[:, None] if vec else m
        top = self.left.apply_qt(m2d)
        bottom = top[self._m1 :]
        rperm = self.right.rows_permutation()
        if not rperm.is_identity():
            bottom = bottom[jnp.asarray(rperm.gather_indices())]
        bottom = self.right.apply_qt(bottom)
        out = jnp.concatenate([top[: self._m1], bottom], axis=0)
        return out[:, 0] if vec else out

    def apply_q(self, m: jnp.ndarray) -> jnp.ndarray:
        vec = m.ndim == 1
        m2d = m[:, None] if vec else m
        bottom = self.right.apply_q(m2d[self._m1 :])
        rperm = self.right.rows_permutation()
        if not rperm.is_identity():
            # undo the row permutation applied in apply_qt
            bottom = bottom[jnp.asarray(rperm.indices)]
        full = jnp.concatenate([m2d[: self._m1], bottom], axis=0)
        out = self.left.apply_q(full)
        return out[:, 0] if vec else out

    # --- R ----------------------------------------------------------------------
    def matrix_r_dense(self) -> jnp.ndarray:
        m1, m2, n1 = self._m1, self._m2, self._n1
        r1 = np.asarray(self.left.matrix_r_dense())
        r2 = np.asarray(self.right.matrix_r_dense())
        R = np.zeros((n1, m1 + m2), dtype=r1.dtype)
        R[:m1, :m1] = r1[:m1, :m1]
        R[:m1, m1:] = np.asarray(self._r12)
        R[m1 : m1 + m2, m1:] = r2[:m2, :m2]
        return jnp.asarray(R)

    @highest_precision
    def solve_r(self, y: jnp.ndarray) -> jnp.ndarray:
        """Block back-substitution: x2 from R2, then x1 from the structured R1."""
        m1, m2 = self._m1, self._m2
        x2 = self.right.solve_r(y[m1 : m1 + m2])
        x1 = self.left.solve_r(y[:m1] - self._r12 @ x2)
        return jnp.concatenate([x1, x2])

    def cols_permutation(self) -> Permutation:
        return self._cols_perm

    def rows_permutation(self) -> Permutation:
        return self._rows_perm
