"""Compute primitives: rotations, FK, rays, encodings, compositing."""

from . import rotations, fk, rays, embedding, encoders, compositing, cylinder  # noqa: F401
