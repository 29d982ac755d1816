from vqwild_tpu.core.config import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from vqwild_tpu.core.logging import RunDir, get_logger
from vqwild_tpu.core.meters import AverageMeter, MedianMeter, Timer

__all__ = [
    "DataConfig",
    "EvalConfig",
    "ExperimentConfig",
    "ModelConfig",
    "TrainConfig",
    "RunDir",
    "get_logger",
    "AverageMeter",
    "MedianMeter",
    "Timer",
]
