"""The QR-solver protocol shared by every solver (Eigen SparseSolver analog).

The reference composes solvers through C++ template parameters sharing the
SparseSolver concept (``compute/analyzePattern/factorize/solve/matrixQ/matrixR/
colsPermutation/rowsPermutation/rank/info``, e.g.
/root/reference/src/QRKit/BlockDiagonalSparseQR.h:94-313).  Here composition is
Python object composition over this protocol; the heavy lifting inside each
method is jitted device code keyed by the solver's static structure plan.

``matrixQ()`` expression templates become two methods: :meth:`apply_q` /
:meth:`apply_qt` operating on whole matrices (the reference's per-column OpenMP
loops become single batched matmuls).
"""
from __future__ import annotations

import abc
import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..sparse import Permutation

__all__ = ["ComputationInfo", "QRSolver"]


class ComputationInfo(enum.Enum):
    SUCCESS = 0
    NUMERICAL_ISSUE = 1
    INVALID_INPUT = 2
    NOT_COMPUTED = 3


class QRSolver(abc.ABC):
    """Abstract QR solver: A (row-permuted, col-permuted) = Q R.

    Contract (mirrors the reference):
      * ``P_rows * A * P_cols = Q * R``
      * callers pre-apply ``rows_permutation()`` to RHS vectors before
        :meth:`solve` (test-qrkit.cpp:235, 273-274)
      * :meth:`solve` returns x with ``x[cols_permutation.indices[i]] = y[i]``
        where y solves ``R y = Qᵀ b``.
    """

    _info: ComputationInfo = ComputationInfo.NOT_COMPUTED

    # --- shape ----------------------------------------------------------------------
    @property
    @abc.abstractmethod
    def rows(self) -> int: ...

    @property
    @abc.abstractmethod
    def cols(self) -> int: ...

    @property
    def rank(self) -> int:
        return self.cols

    def info(self) -> ComputationInfo:
        return self._info

    # --- factorization --------------------------------------------------------------
    @abc.abstractmethod
    def compute(self, mat, **kwargs) -> "QRSolver": ...

    # --- factors --------------------------------------------------------------------
    @abc.abstractmethod
    def apply_q(self, m: jnp.ndarray) -> jnp.ndarray:
        """Q @ m for a vector [rows] or matrix [rows, k]."""

    @abc.abstractmethod
    def apply_qt(self, m: jnp.ndarray) -> jnp.ndarray:
        """Qᵀ @ m."""

    @abc.abstractmethod
    def matrix_r_dense(self) -> jnp.ndarray:
        """Dense R [rows, cols] (tests/interop; large problems use solve_r)."""

    @abc.abstractmethod
    def solve_r(self, y: jnp.ndarray) -> jnp.ndarray:
        """Solve R[:cols,:cols] x = y[:cols] with the structured R."""

    def cols_permutation(self) -> Permutation:
        return Permutation.identity(self.cols)

    def rows_permutation(self) -> Permutation:
        return Permutation.identity(self.rows)

    # --- least squares ----------------------------------------------------------
    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """Least-squares solve (the _solve_impl shape shared by all reference
        solvers, e.g. BandedBlockedSparseQR.h:290-311): y = Qᵀ b, triangular
        solve on the leading rank×rank block, column back-permutation.

        The caller is responsible for pre-applying ``rows_permutation()`` to b.
        """
        y = self.apply_qt(b)
        z = self.solve_r(y[: self.cols])
        perm = self.cols_permutation()
        if perm.is_identity():
            return z
        gather = jnp.asarray(perm.gather_indices())
        return z[gather]

    # --- diagnostics ----------------------------------------------------------------
    def validate(self, rtol: float = 0.0) -> ComputationInfo:
        """Numerical-health check on the factorization (the reference's
        ``info() == NumericalIssue`` path, set only implicitly there).

        Flags NUMERICAL_ISSUE when R's leading diagonal contains non-finite
        values or entries below ``rtol * max|diag|`` (rank collapse a
        non-rank-revealing solver would silently propagate).  Updates and
        returns :meth:`info`.
        """
        d = np.abs(np.diag(np.asarray(self.matrix_r_dense())[: self.cols, : self.cols]))
        if d.size and (not np.all(np.isfinite(d)) or (d.min() <= rtol * d.max())):
            self._info = ComputationInfo.NUMERICAL_ISSUE
        return self._info

    # --- parity helpers -------------------------------------------------------------
    def matrix_q_dense(self) -> jnp.ndarray:
        """Explicit dense Q (tests only) = apply_q(I)."""
        return self.apply_q(jnp.eye(self.rows, dtype=self.matrix_r_dense().dtype))
