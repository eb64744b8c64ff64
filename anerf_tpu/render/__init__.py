"""Rendering engine: full-image renderer, pose generators, meshing."""

from . import mesh, poses, renderer  # noqa: F401
from .renderer import ImageRenderer, kp_to_valid_rays  # noqa: F401
