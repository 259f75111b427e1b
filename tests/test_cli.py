"""python -m qrkit_tpu — MatrixMarket CLI round trip.

The reference has no executable at all; the CLI is the "run it on my matrix"
driver: load → auto-select → factorize → solve → export factors.
"""
import numpy as np

from qrkit_tpu.__main__ import main
from qrkit_tpu.sparse import load_matrix_market, save_matrix_market

from generators import block_diagonal_matrix, overlapping_block_diagonal_matrix


def test_cli_solve_and_exports(tmp_path, rng, capsys):
    mat = block_diagonal_matrix(40, 140, rng, permute_rows=True)
    a = tmp_path / "a.mtx"
    save_matrix_market(str(a), mat)
    out = tmp_path / "x.mtx"
    r_out = tmp_path / "r.mtx"
    q_out = tmp_path / "q.mtx"
    rc = main(
        [
            str(a), "--rhs-random", "-o", str(out),
            "--export-r", str(r_out), "--export-q", str(q_out),
            "--suggested-block-cols", "3",
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "solver=block_diagonal" in err
    assert "recovery rel err" in err
    x = load_matrix_market(str(out)).to_dense()[:, 0]
    assert x.shape == (40,)
    R = load_matrix_market(str(r_out))
    Q = load_matrix_market(str(q_out))
    # P_r A P_c == Q R on the exports
    import qrkit_tpu

    qr = qrkit_tpu.auto_qr(mat, suggested_block_cols=3)
    pa = qr.rows_permutation().apply(mat.to_dense())
    pap = pa[:, qr.cols_permutation().indices]
    assert np.allclose(Q.to_dense() @ R.to_dense(), pap, atol=1e-8)


def test_cli_forced_banded(tmp_path, rng, capsys):
    mat = overlapping_block_diagonal_matrix(40, 140, rng, permute_rows=False)
    a = tmp_path / "a.mtx"
    save_matrix_market(str(a), mat)
    rc = main([str(a), "--solver", "banded", "--suggested-block-cols", "4",
               "--rhs-random"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "solver=banded" in err
