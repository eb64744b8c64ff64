"""Data layer: h5 datasets, loaders, host input pipeline."""

from . import dataset, h5_writer, loaders, pipeline  # noqa: F401
from .loaders import load_data, get_dataset  # noqa: F401
