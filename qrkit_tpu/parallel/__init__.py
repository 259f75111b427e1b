from .mesh import default_mesh, shard_leading_axis
from .tsqr import TSQRDenseQR, tsqr_factorize

__all__ = ["default_mesh", "shard_leading_axis", "TSQRDenseQR", "tsqr_factorize"]
