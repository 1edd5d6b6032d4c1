"""optimaltextures_tpu — TPU-native texture synthesis & style transfer via
sliced optimal transport (capabilities of JCBrouwer/OptimalTextures,
re-designed for JAX/XLA/Pallas on TPU).
"""

__version__ = "0.2.0"

from .config import OptexConfig  # noqa: F401
