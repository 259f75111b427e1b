from .base import ComputationInfo, QRSolver
from .block_diagonal import BlockDiagonalQR, QFormat

__all__ = ["ComputationInfo", "QRSolver", "BlockDiagonalQR", "QFormat"]
