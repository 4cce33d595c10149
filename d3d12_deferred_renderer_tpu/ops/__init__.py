from . import transform, gbuffer, lighting, post

__all__ = ["transform", "gbuffer", "lighting", "post"]
