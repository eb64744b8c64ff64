"""Utilities: config, logging, checkpointing helpers."""

from . import config  # noqa: F401
