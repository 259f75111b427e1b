"""Structured-matrix containers (device-side, pytree-friendly).

TPU-native analogs of the reference's L2 containers:

* :class:`BlockDiagonal`  — ``SparseBlockDiagonal<BlockMatrixType>``
  (/root/reference/src/QRKit/SparseBlockDiagonal.h:43-163).  Instead of a
  vector of heterogeneous Eigen blocks it stores one dense ``[nb, br, bc]``
  array — the shape a vmapped MXU kernel wants.
* :class:`BlockMatrix1x2` — the non-owning ``[Left | Right]`` composite view
  (/root/reference/src/QRKit/BlockMatrix1x2.h:31-67).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .analysis import as_banded_as_possible, block_banded_info
from .sparse import Permutation, SparseCSR

__all__ = ["BlockDiagonal", "BlockMatrix1x2"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockDiagonal:
    """Uniform block-diagonal matrix as a stacked dense batch.

    ``blocks[i]`` sits at rows ``i*br``, cols ``i*bc`` of the logical matrix;
    ``nrows/ncols`` may exceed ``nb*br`` / ``nb*bc`` (zero tail rows — the
    reference appends an identity Q tail for those,
    BlockDiagonalSparseQR.h:530-533).
    """

    blocks: jnp.ndarray  # [nb, br, bc]
    nrows: int
    ncols: int

    def tree_flatten(self):
        return (self.blocks,), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def num_blocks(self) -> int:
        return self.blocks.shape[0]

    @property
    def block_rows(self) -> int:
        return self.blocks.shape[1]

    @property
    def block_cols(self) -> int:
        return self.blocks.shape[2]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows, self.ncols)

    # --- constructors (mirror SparseBlockDiagonal.h:71-130) -------------------------
    @staticmethod
    def from_block_diagonal_pattern(
        mat: SparseCSR, block_rows: int, block_cols: int
    ) -> "BlockDiagonal":
        """Split an already-block-diagonal sparse matrix into the dense batch."""
        nb = mat.ncols // block_cols
        blocks = mat.blocks_dense(
            [(i * block_rows, i * block_cols, block_rows, block_cols) for i in range(nb)],
            block_rows,
            block_cols,
        )
        return BlockDiagonal(jnp.asarray(blocks), mat.nrows, mat.ncols)

    @staticmethod
    def from_sparse_matrix(
        mat: SparseCSR, suggested_block_cols: int = 3
    ) -> Tuple["BlockDiagonal", Permutation]:
        """Detect block structure in a general sparse matrix (abap row sort +
        block detection, SparseBlockDiagonal.h:95-130) and return the container
        plus the row permutation that was applied."""
        perm, has_perm = as_banded_as_possible(mat)
        sorted_mat = mat.permute_rows(perm) if has_perm else mat
        plan = block_banded_info(sorted_mat, suggested_block_cols)
        if plan.num_blocks == 0:
            raise ValueError("no block structure detected in the matrix")
        br = plan.max_block_rows
        bc = plan.max_block_cols
        # The dense [nb, br, bc] batch assumes block i sits at (i*br, i*bc)
        # with uniform shape; a non-uniform detected plan (e.g. mixed 7- and
        # 9-row blocks) would silently misalign rows here.  The reference's
        # SparseBlockDiagonal keeps per-block offsets and handles it — our
        # banded solver is the right tool for those structures.
        for i, b in enumerate(plan.blocks):
            if (b.nrows, b.ncols, b.row, b.col) != (br, bc, i * br, i * bc):
                raise ValueError(
                    "detected plan is not a uniform block diagonal at "
                    f"(i*{br}, i*{bc}) (block {i} at ({b.row}, {b.col}) is "
                    f"{b.nrows}x{b.ncols}); use BandedBlockedQR instead"
                )
        blocks = sorted_mat.blocks_dense([b.astuple() for b in plan.blocks], br, bc)
        return BlockDiagonal(jnp.asarray(blocks), mat.nrows, mat.ncols), perm

    @staticmethod
    def from_dense_batch(blocks, nrows: Optional[int] = None, ncols: Optional[int] = None):
        blocks = jnp.asarray(blocks)
        nb, br, bc = blocks.shape
        return BlockDiagonal(blocks, nrows or nb * br, ncols or nb * bc)

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=np.asarray(self.blocks).dtype)
        b = np.asarray(self.blocks)
        br, bc = self.block_rows, self.block_cols
        for i in range(self.num_blocks):
            out[i * br : (i + 1) * br, i * bc : (i + 1) * bc] = b[i]
        return out


@dataclasses.dataclass
class BlockMatrix1x2:
    """``[Left | Right]`` composite with heterogeneous halves.

    ``left`` may be a SparseCSR, BlockDiagonal, or dense array; ``right`` is
    typically dense ([m, m2]) or SparseCSR.  Blocks must share a row count
    (BlockMatrix1x2.h:42).
    """

    left: Any
    right: Any

    def __post_init__(self):
        assert self.left_rows == self.right_rows, "row counts must match"

    @staticmethod
    def _rows(block) -> int:
        if isinstance(block, BlockDiagonal):
            return block.nrows
        if isinstance(block, SparseCSR):
            return block.nrows
        return int(block.shape[0])

    @staticmethod
    def _cols(block) -> int:
        if isinstance(block, BlockDiagonal):
            return block.ncols
        if isinstance(block, SparseCSR):
            return block.ncols
        return int(block.shape[1])

    @property
    def left_rows(self) -> int:
        return self._rows(self.left)

    @property
    def right_rows(self) -> int:
        return self._rows(self.right)

    @property
    def left_cols(self) -> int:
        return self._cols(self.left)

    @property
    def right_cols(self) -> int:
        return self._cols(self.right)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.left_rows, self.left_cols + self.right_cols)
