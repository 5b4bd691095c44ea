from .config import (
    Config,
    DefaultStrategyConfig,
    MCMCStrategyConfig,
    MonocularDepthInitConfig,
    DepthAlignmentConfig,
    DepthSubsamplingConfig,
    AdaptiveSubsamplingConfig,
    SfmPointsMaskConfig,
    PointCloudPostprocessConfig,
    RansacConfig,
    InterpolatedAlignmentConfig,
    SegmentationConfig,
)
from .cli import parse_cli, apply_overrides

__all__ = [
    "Config",
    "DefaultStrategyConfig",
    "MCMCStrategyConfig",
    "MonocularDepthInitConfig",
    "DepthAlignmentConfig",
    "DepthSubsamplingConfig",
    "AdaptiveSubsamplingConfig",
    "SfmPointsMaskConfig",
    "PointCloudPostprocessConfig",
    "RansacConfig",
    "InterpolatedAlignmentConfig",
    "SegmentationConfig",
    "parse_cli",
    "apply_overrides",
]
