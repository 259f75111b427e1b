"""Segment-axis sharding of the segmented banded solver (8-device CPU mesh).

The segment axis is the banded family's distribution axis: phase 1 partitions
with zero communication; only the boundary reduction crosses shards.  Uses
only the public API (``SegmentedBandedQR(mesh=...)``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from qrkit_tpu.parallel import default_mesh
from qrkit_tpu.solvers import SegmentedBandedQR

from generators import overlapping_block_diagonal_matrix


def test_segmented_sharded_matches(rng):
    spj = overlapping_block_diagonal_matrix(256, 896, rng, permute_rows=False)
    mesh = default_mesh()
    qr = SegmentedBandedQR(
        suggested_block_cols=2, segment_blocks=16, mesh=mesh
    ).compute(spj)
    assert qr._delegate is None, "fixture must exercise the segmented path"
    if qr.S % mesh.devices.size == 0:
        # the factors really are distributed over the segment axis
        assert len(qr._Yws.sharding.device_set) == mesh.devices.size
    dense = spj.to_dense()
    x_true = rng.normal(size=spj.ncols)
    b = qr.rows_permutation().apply(dense @ x_true)
    x = np.asarray(qr.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-7)

    # sharded == unsharded equality on the full solution
    qr_ref = SegmentedBandedQR(suggested_block_cols=2, segment_blocks=16).compute(spj)
    x_ref = np.asarray(qr_ref.solve(jnp.asarray(b)))
    assert np.allclose(x, x_ref, atol=1e-12)
