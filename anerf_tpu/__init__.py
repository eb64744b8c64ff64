"""anerf_tpu: a TPU-native articulated-NeRF framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
A-NeRF reference (danielajisafe/A-NeRF): person-specific articulated
neural radiance fields learned from video with joint pose refinement.
"""

__version__ = '0.1.0'

from . import skeleton  # noqa: F401
from .skeleton import Skeleton, SMPLSkeleton, SMPL_REST_POSE  # noqa: F401
