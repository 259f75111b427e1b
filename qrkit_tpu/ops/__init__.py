from .householder import (
    apply_wy,
    batched_panel_qr_yt,
    build_t_factor,
    colpiv_householder_qr,
    form_q,
    householder_qr_unblocked,
    panel_qr_yt,
)
from .compact_wy import CompactWYSeq

__all__ = [
    "apply_wy",
    "batched_panel_qr_yt",
    "build_t_factor",
    "colpiv_householder_qr",
    "form_q",
    "householder_qr_unblocked",
    "panel_qr_yt",
    "CompactWYSeq",
]
