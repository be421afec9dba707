from .ordinal import AdditiveOrdinalEmbedder, BasicOrdinalEmbedder
from .purifier import FeaturePurifier, MultiheadAttention
from .projection import ImageProjection, ImageProjectionPlus

__all__ = [
    "AdditiveOrdinalEmbedder",
    "BasicOrdinalEmbedder",
    "FeaturePurifier",
    "MultiheadAttention",
    "ImageProjection",
    "ImageProjectionPlus",
]
