from pointseg.nn.mlp import SharedMLP, leaky_relu_02  # noqa: F401
from pointseg.nn.blocks import (  # noqa: F401
    SetAbstraction,
    SetAbstractionMSG,
    FeaturePropagation,
    InvResMLP,
    EdgeConv,
    TNet,
)
