"""Typed config loading for the tracker CLI.

The reference has no config system — plain C++ option structs filled by an
absent caller (SURVEY.md §5 config row). Here: JSON files map directly onto
the frozen dataclass configs, with explicit unknown-key errors.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

from ..solver.lm import LMOptions
from ..tracker.blur_tracker import TrackerConfig
from ..tracker.detector import DetectorOptions


def _build(cls, data: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(
            f"unknown {cls.__name__} keys: {sorted(unknown)}; "
            f"valid keys: {sorted(fields)}"
        )
    kwargs = {}
    for k, v in data.items():
        if k == "detector" and isinstance(v, dict):
            v = _build(DetectorOptions, v)
        if isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def tracker_config_from_dict(data: Dict[str, Any]) -> TrackerConfig:
    return _build(TrackerConfig, data)


def load_tracker_config(path: str) -> TrackerConfig:
    with open(path) as f:
        return tracker_config_from_dict(json.load(f))


def backend_config_from_dict(data: Dict[str, Any]):
    """BackendConfig from JSON (nested 'detector' / 'ba' / 'pose_graph'
    dicts supported; unknown keys error like the tracker config)."""
    from ..backend.ba import BAOptions
    from ..backend.pose_graph import PoseGraphOptions
    from ..backend.vo_backend import BackendConfig

    data = dict(data)
    if isinstance(data.get("ba"), dict):
        data["ba"] = _build(BAOptions, data["ba"])
    if isinstance(data.get("pose_graph"), dict):
        data["pose_graph"] = _build(PoseGraphOptions, data["pose_graph"])
    return _build(BackendConfig, data)


def tracker_config_to_dict(cfg: TrackerConfig) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    return d


def save_tracker_config(cfg: TrackerConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(tracker_config_to_dict(cfg), f, indent=2)
