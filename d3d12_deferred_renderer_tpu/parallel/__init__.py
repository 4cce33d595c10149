from .mesh import make_mesh
from .sharded import (
    render_frames_batch_sharded,
    render_frames_batch_tri_sharded,
    render_sharded,
    render_tri_sharded,
)

__all__ = [
    "make_mesh",
    "render_sharded",
    "render_frames_batch_sharded",
    "render_tri_sharded",
    "render_frames_batch_tri_sharded",
]
