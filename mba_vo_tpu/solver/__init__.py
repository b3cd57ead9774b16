"""Trust-region Levenberg-Marquardt machinery, fully on-device."""

from .lm import (
    LMOptions,
    LMSummary,
    optimize_level,
    detect_outliers,
)
