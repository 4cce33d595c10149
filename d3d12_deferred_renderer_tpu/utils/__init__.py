from .image import write_png, read_png

__all__ = ["write_png", "read_png"]
