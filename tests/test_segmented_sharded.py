"""Segment-axis sharding of the segmented banded solver (8-device CPU mesh).

The segment axis is the banded family's distribution axis: phase 1 partitions
with zero communication; only the boundary reduction crosses shards.
"""
import jax
import jax.numpy as jnp
import numpy as np

from qrkit_tpu.parallel import default_mesh, shard_leading_axis
from qrkit_tpu.solvers import SegmentedBandedQR

from generators import overlapping_block_diagonal_matrix


def test_segmented_sharded_matches(rng):
    spj = overlapping_block_diagonal_matrix(256, 896, rng, permute_rows=False)
    qr = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=16).compute(spj)
    # shard the factorization outputs over the segment axis and re-run a solve:
    # the vmapped applies partition over segments with no cross-shard traffic
    mesh = default_mesh()
    if qr.S % mesh.devices.size == 0:
        qr._Yws = shard_leading_axis(qr._Yws, mesh)
        qr._Ts = shard_leading_axis(qr._Ts, mesh)
        qr._r_panels = shard_leading_axis(qr._r_panels, mesh)
    dense = spj.to_dense()
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7)
