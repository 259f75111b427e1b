from .base import ComputationInfo, QRSolver
from .block_diagonal import BlockDiagonalQR, QFormat
from .banded_blocked import BandedBlockedQR

__all__ = [
    "ComputationInfo",
    "QRSolver",
    "BlockDiagonalQR",
    "QFormat",
    "BandedBlockedQR",
]
