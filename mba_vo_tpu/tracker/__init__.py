"""The blur-aware direct tracker: detection, keyframing, frame orchestration."""

from .detector import detect_semidense, DetectorOptions
from .blur_tracker import BlurAwareTracker, TrackerConfig
