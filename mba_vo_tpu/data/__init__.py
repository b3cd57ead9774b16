"""Datasets, synthetic oracles, and trajectory I/O."""

from .synthetic import (
    shapes_image,
    warp_image,
    synthesize_blurred_image,
)
