"""Model layer: NeRF MLP, raycaster, factory."""

from . import nerf_mlp, raycaster, factory  # noqa: F401
from .nerf_mlp import NeRFConfig, init_nerf_params, nerf_forward  # noqa: F401
from .raycaster import RayCastConfig, render_rays, render_pts_density  # noqa: F401
from .factory import (build_raycast_config, init_raycaster_params,  # noqa: F401
                      embed_state)
