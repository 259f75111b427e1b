"""Structure-plan persistence — the checkpoint/resume analog.

The reference's only "resume" machinery is the analyzePattern/factorize split
(pattern analysis cached across repeated factorizations,
/root/reference/src/QRKit/BandedBlockedSparseQR.h:170-182).  Here the analysis
result is already a static, hashable :class:`~qrkit_tpu.plan.StructurePlan`
that keys jit caches; this module serializes plans (and orderings) to JSON so a
production job can skip re-analysis entirely on restart — strictly more than
reference parity (SURVEY §5.4).
"""
from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

from .plan import BlockInfo, StructurePlan
from .sparse import Permutation

__all__ = ["plan_to_json", "plan_from_json", "save_analysis", "load_analysis"]

_VERSION = 1


def plan_to_json(plan: StructurePlan) -> str:
    return json.dumps(
        {
            "version": _VERSION,
            "nrows": plan.nrows,
            "ncols": plan.ncols,
            "nnz_q_estimate": plan.nnz_q_estimate,
            "blocks": [b.astuple() for b in plan.blocks],
        }
    )


def plan_from_json(text: str) -> StructurePlan:
    d = json.loads(text)
    assert d.get("version") == _VERSION, "unsupported plan version"
    return StructurePlan(
        d["nrows"],
        d["ncols"],
        tuple(BlockInfo(*b) for b in d["blocks"]),
        d["nnz_q_estimate"],
    )


def save_analysis(
    path: str, plan: StructurePlan, row_perm: Optional[Permutation] = None,
    col_perm: Optional[Permutation] = None,
):
    d = json.loads(plan_to_json(plan))
    if row_perm is not None:
        d["row_perm"] = row_perm.indices.tolist()
    if col_perm is not None:
        d["col_perm"] = col_perm.indices.tolist()
    with open(path, "w") as f:
        json.dump(d, f)


def load_analysis(path: str) -> Tuple[StructurePlan, Optional[Permutation], Optional[Permutation]]:
    with open(path) as f:
        d = json.load(f)
    plan = plan_from_json(json.dumps(d))
    rp = Permutation(np.asarray(d["row_perm"])) if "row_perm" in d else None
    cp = Permutation(np.asarray(d["col_perm"])) if "col_perm" in d else None
    return plan, rp, cp
