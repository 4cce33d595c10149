from .mesh import make_mesh
from .sharded import render_sharded, render_frames_batch_sharded

__all__ = ["make_mesh", "render_sharded", "render_frames_batch_sharded"]
