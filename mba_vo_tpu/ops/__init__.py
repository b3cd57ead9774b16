"""Image / warping / residual compute ops — the XLA and Pallas compute path."""

from .image import (
    image_pyramid,
    downsample2x,
    image_gradients,
    gradient_magnitude,
    bilinear_sample,
    sample_lk,
    in_bounds,
)
