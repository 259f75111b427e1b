from .base import ComputationInfo, QRSolver
from .block_diagonal import BlockDiagonalQR, QFormat
from .banded_blocked import BandedBlockedQR
from .blocked_thin import BlockedThinDenseQR, BlockedThinSparseQR

__all__ = [
    "ComputationInfo",
    "QRSolver",
    "BlockDiagonalQR",
    "QFormat",
    "BandedBlockedQR",
    "BlockedThinDenseQR",
    "BlockedThinSparseQR",
]
