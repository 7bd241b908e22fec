from kanvit.models.decoder import CausalDecoder
from kanvit.models.vit import VisionTransformer, create_model

__all__ = ["CausalDecoder", "VisionTransformer", "create_model"]
