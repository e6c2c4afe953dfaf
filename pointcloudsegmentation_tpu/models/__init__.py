"""Model zoo: PointNet dilated-embed, ECD/PGNet, GPN anchored convs, heads."""
from .layers import (AnchorConv, Dense, ECDConv, FCEmbed, GPNConv, GrowthMLP,  # noqa: F401
                     PointNetConv, PointNetPoolMLP, ProbsDiffusion,
                     SegClassifier, classifier_v2, classifier_v4,
                     classifier_v5)
from .pointnet import (Arch, ConvSpec, PointNetSegEncoder, PreStageSpec,  # noqa: F401
                       S3DIS_ARCH, SCANNET_ARCH, SEMANTIC3D_ARCH,
                       SEMANTIC3D_DILATE_ARCH, StageSpec)
from .ecd import (ECDSegModel, ECDStage, ECDStageSpec, ECDStageV2,  # noqa: F401
                  MLPAnchorConv, PGNetHybrid, PGNetV6, PGNetV7,
                  PGNET_V3_SPEC, PGNET_V4_SPEC, PGNET_V5_SPEC,
                  PGNET_V6_SPEC, PGNET_V7_SPEC, PGNET_V8_SPEC,
                  S3DIS_ECD_SPEC, SCANNET_ECD_SPEC)
from .variants import (DiffFeatsWLW, DiffusionAnchorConv, ECDFeatsV2,  # noqa: F401
                       ECDFeatsV4, ECDXyzV2, GPNConvV2, MaskedBatchNorm,
                       WLWConv, compute_wlw)
from .gpn import (ClassifierHead, GPNClassModel, GPNSegModel, GPNStage,  # noqa: F401
                  GPNStageSpec, MODELNET_SPEC)
from .fast_conv import PointNetConvFast  # noqa: F401
from .context import ContextFusionModel, ContextNet  # noqa: F401
from .template import SemanticPoolRefine, TemplateSegModel  # noqa: F401
from .dense import DenseFeats  # noqa: F401
