from .base import ComputationInfo, QRSolver
from .block_diagonal import BlockDiagonalQR, QFormat
from .banded_blocked import BandedBlockedQR
from .blocked_thin import BlockedThinDenseQR, BlockedThinSparseQR
from .block_angular import BlockAngularQR
from .dense import DenseColPivQR, DenseHouseholderQR

__all__ = [
    "ComputationInfo",
    "QRSolver",
    "BlockDiagonalQR",
    "QFormat",
    "BandedBlockedQR",
    "BlockedThinDenseQR",
    "BlockedThinSparseQR",
    "BlockAngularQR",
    "DenseColPivQR",
    "DenseHouseholderQR",
]
from .segmented_banded import SegmentedBandedQR  # noqa: E402

__all__.append("SegmentedBandedQR")
