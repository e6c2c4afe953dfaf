"""Model zoo: PointNet dilated-embed, ECD/PGNet, GPN anchored convs, heads."""
from .layers import (AnchorConv, Dense, ECDConv, FCEmbed, GPNConv, GrowthMLP,  # noqa: F401
                     PointNetConv, PointNetPoolMLP, ProbsDiffusion,
                     SegClassifier)
from .pointnet import (Arch, ConvSpec, PointNetSegEncoder, PreStageSpec,  # noqa: F401
                       S3DIS_ARCH, SCANNET_ARCH, SEMANTIC3D_ARCH, StageSpec)
from .ecd import (ECDSegModel, ECDStage, ECDStageSpec, MLPAnchorConv,  # noqa: F401
                  PGNetHybrid, PGNET_V8_SPEC, S3DIS_ECD_SPEC,
                  SCANNET_ECD_SPEC)
from .gpn import (ClassifierHead, GPNClassModel, GPNSegModel, GPNStage,  # noqa: F401
                  GPNStageSpec, MODELNET_SPEC)
from .fast_conv import PointNetConvFast  # noqa: F401
from .context import ContextFusionModel, ContextNet  # noqa: F401
from .template import SemanticPoolRefine, TemplateSegModel  # noqa: F401
from .dense import DenseFeats  # noqa: F401
