"""Training: losses, pose optimization, trainer, checkpointing."""

from . import losses, pose_opt, trainer  # noqa: F401
