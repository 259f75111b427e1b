"""Plan persistence and profiling utilities."""
import os

import numpy as np

from qrkit_tpu.analysis import as_banded_as_possible, block_banded_info
from qrkit_tpu.persist import load_analysis, plan_from_json, plan_to_json, save_analysis
from qrkit_tpu.profiling import Timer, timed

from generators import overlapping_block_diagonal_matrix


def test_plan_roundtrip(rng, tmp_path):
    mat = overlapping_block_diagonal_matrix(128, 448, rng, permute_rows=True)
    perm, _ = as_banded_as_possible(mat)
    plan = block_banded_info(mat.permute_rows(perm), 2)
    assert plan_from_json(plan_to_json(plan)) == plan

    path = os.path.join(tmp_path, "analysis.json")
    save_analysis(path, plan, row_perm=perm)
    plan2, rp, cp = load_analysis(path)
    assert plan2 == plan
    assert np.array_equal(rp.indices, perm.indices)
    assert cp is None
    # hashability survives the round trip (jit-cache keying)
    assert hash(plan2) == hash(plan)


def test_timer_and_timed():
    import jax.numpy as jnp

    timer = Timer()
    with timer("section"):
        pass
    out, secs = timed(lambda: jnp.ones(8) * 2)
    assert float(out[0]) == 2.0
    assert secs >= 0
    assert "section" in timer.summary()


def test_resume_from_saved_analysis(rng, tmp_path):
    """Checkpoint/resume: analyze once, persist, then factorize on 'restart'
    via set_analysis without re-running pattern analysis."""
    import jax.numpy as jnp

    from generators import overlapping_block_diagonal_matrix
    from qrkit_tpu.solvers import BandedBlockedQR

    spj = overlapping_block_diagonal_matrix(64, 224, rng, permute_rows=True)
    fresh = BandedBlockedQR(suggested_block_cols=4)
    fresh.analyze_pattern(spj)
    path = str(tmp_path / "analysis.json")
    save_analysis(path, fresh.plan, row_perm=fresh.rows_permutation())
    fresh.compute(spj)

    plan, rp, _ = load_analysis(path)
    resumed = BandedBlockedQR(suggested_block_cols=4)
    resumed.set_analysis(plan, rp)
    resumed.compute(spj)

    x_true = rng.normal(size=spj.ncols)
    b = resumed.rows_permutation().apply(spj.to_dense() @ x_true)
    x = np.asarray(resumed.solve(jnp.asarray(b)))
    assert np.allclose(x, x_true, atol=1e-8)
    assert np.allclose(
        np.asarray(resumed.matrix_r_dense()), np.asarray(fresh.matrix_r_dense()),
        atol=1e-12,
    )
