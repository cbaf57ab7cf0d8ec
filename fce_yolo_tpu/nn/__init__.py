"""NN layer: module zoo, FCE blocks, YAML graph parser, detection models."""

from fce_yolo_tpu.nn.modules import (
    C2PSA,
    C3,
    C3k,
    C3k2,
    SPPF,
    Attention,
    Bottleneck,
    Concat,
    ConvBNAct,
    Detect,
    DWConvBNAct,
    PSABlock,
    Upsample,
)
from fce_yolo_tpu.nn.fce import BiCoordCrossAtt, BiFPN_Concat, CoordAtt, CoordCrossAtt

__all__ = [
    "Attention",
    "BiCoordCrossAtt",
    "BiFPN_Concat",
    "Bottleneck",
    "C2PSA",
    "C3",
    "C3k",
    "C3k2",
    "Concat",
    "ConvBNAct",
    "CoordAtt",
    "CoordCrossAtt",
    "Detect",
    "DWConvBNAct",
    "PSABlock",
    "SPPF",
    "Upsample",
]
