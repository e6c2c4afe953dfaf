"""Dataclass config tree.

The reference scatters hyperparameters across per-script argparse flags
(train_gpn_scannet_new.py:13-38) and hardcodes architecture constants inside
model functions (model_pointnet.py:935,966,1015).  Here everything lives in
one typed tree.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class OptimConfig:
    """Adam + staircase exponential LR decay with a floor
    (train_graph_pool_new.py:83-88)."""

    lr_init: float = 1e-3
    lr_clip: float = 1e-5
    decay_rate: float = 0.5
    decay_epoch: int = 50          # epochs per decay step
    epoch_steps: int = 2000        # optimizer steps per epoch


@dataclass(frozen=True)
class DataConfig:
    num_points: int = 8192         # static per-block point budget
    num_classes: int = 13
    block_size: float = 3.0
    voxel_sizes: Tuple[float, float] = (0.15, 0.45)
    caps: Tuple[int, int] = (4096, 1024)
    feat_dim: int = 12             # rgb(3) + covars(9) for S3DIS
    ignore_label: Optional[int] = None   # ScanNet masks label 0
    class_weights: Optional[Tuple[float, ...]] = None


@dataclass(frozen=True)
class TrainConfig:
    model: str = "pointnet_s3dis"  # registry key
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    batch_per_device: int = 1      # reference default --batch_size 1/GPU
    compute_dtype: str = "bfloat16"  # "float32" | "bfloat16" (params f32)
    diffusion_steps: int = 0       # graph_probs_diffusion (--use_diffusion)
    num_epochs: int = 100
    seed: int = 0
    log_every: int = 120           # reference --log_step
    checkpoint_dir: Optional[str] = None
    keep_checkpoints: int = 500    # reference Saver(max_to_keep=500)


# S3DIS class weights (train_graph_pool_new.py:46-49)
S3DIS_CLASS_WEIGHTS = (
    2.80089331, 2.92693353, 2.94871211, 5.12748384, 5.07317114,
    5.18505001, 4.612535, 4.83436918, 4.1070838, 5.36530066, 4.64813137,
    5.26789713, 3.67803526)


def s3dis_config(**overrides) -> TrainConfig:
    base = TrainConfig(
        model="pointnet_s3dis",
        data=DataConfig(num_points=8192, num_classes=13, block_size=3.0,
                        voxel_sizes=(0.15, 0.45), caps=(4096, 1024),
                        feat_dim=12, class_weights=S3DIS_CLASS_WEIGHTS),
        optim=OptimConfig(epoch_steps=2000, decay_epoch=50))
    return _replace(base, overrides)


def scannet_config(**overrides) -> TrainConfig:
    # ScanNet: no color, ignore label 0, labels shifted by -1 after masking
    # (train_gpn_scannet_new.py:66-88)
    base = TrainConfig(
        model="pointnet_scannet",
        data=DataConfig(num_points=8192, num_classes=20, block_size=3.0,
                        voxel_sizes=(0.15, 0.45), caps=(4096, 1024),
                        feat_dim=0, ignore_label=0),
        optim=OptimConfig(epoch_steps=5000, decay_epoch=50))
    return _replace(base, overrides)


def semantic3d_config(**overrides) -> TrainConfig:
    base = TrainConfig(
        model="pointnet_semantic3d",
        data=DataConfig(num_points=10240, num_classes=8, block_size=10.0,
                        voxel_sizes=(0.25, 0.75), caps=(5120, 1280),
                        feat_dim=13),   # rgb(3)+intensity(1)+covars(9)
        optim=OptimConfig(epoch_steps=2000, decay_epoch=50))
    return _replace(base, overrides)


def modelnet40_config(**overrides) -> TrainConfig:
    base = TrainConfig(
        model="gpn_modelnet40",
        data=DataConfig(num_points=1024, num_classes=40, block_size=2.0,
                        voxel_sizes=(0.2, 0.5), caps=(384, 96), feat_dim=9),
        optim=OptimConfig(epoch_steps=2460, decay_epoch=50))
    return _replace(base, overrides)


def _replace(cfg: TrainConfig, overrides: dict) -> TrainConfig:
    import dataclasses

    data_over = {k[5:]: v for k, v in overrides.items()
                 if k.startswith("data_")}
    optim_over = {k[6:]: v for k, v in overrides.items()
                  if k.startswith("optim_")}
    top = {k: v for k, v in overrides.items()
           if not k.startswith(("data_", "optim_"))}
    if data_over:
        top["data"] = dataclasses.replace(cfg.data, **data_over)
    if optim_over:
        top["optim"] = dataclasses.replace(cfg.optim, **optim_over)
    return dataclasses.replace(cfg, **top)
