"""Training: configs, metrics, model registry, generic loop."""
from .config import (DataConfig, OptimConfig, TrainConfig,  # noqa: F401
                     modelnet40_config, s3dis_config, scannet_config,
                     semantic3d_config)
from .loop import Trainer, TrainState, make_lr_schedule, seg_loss  # noqa: F401
from .model_zoo import build_model  # noqa: F401
from . import metrics  # noqa: F401
