"""Rendering engine: full-image renderer, pose generators, meshing,
curated render catalog."""

from . import catalog, mesh, poses, renderer  # noqa: F401
from .catalog import init_catalog, resolve_entry  # noqa: F401
from .renderer import ImageRenderer, kp_to_valid_rays  # noqa: F401
