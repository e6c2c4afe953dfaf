"""Full-scene inference & evaluation."""
from .interpolate import (S3DIS_RATIO, SEMANTIC3D_RATIO,  # noqa: F401
                          eval_rot_ensemble_probs, eval_scene_probs,
                          interpolate_to_dense, save_semantic3d_labels,
                          scene_iou)
