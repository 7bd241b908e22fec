from kanvit.models.vit import VisionTransformer, create_model

__all__ = ["VisionTransformer", "create_model"]
