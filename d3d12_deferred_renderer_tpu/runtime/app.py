"""App shell: the frame loop (the reference's main() while-loop, main.cpp:161-342).

Headless by design — the 'window' is a PNG/frame-callback sink fed by the triple-
buffered PresentQueue.  `App.run(n)` is the complete replacement for the reference's
GLFW loop: animate -> render (one jitted XLA program) -> present, with the CPU ahead
of the device by up to `frames_in_flight` frames.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import d3d12_deferred_renderer_tpu as dxr

from ..config import RendererConfig
from ..scene import SceneState
from .present import PresentQueue


@dataclasses.dataclass
class FrameStats:
    frames: int = 0
    elapsed_s: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames / self.elapsed_s if self.elapsed_s else 0.0


class App:
    """Frame loop driver.

    present_callback(frame_index, np.uint8[H,W,3]) receives every presented frame
    (e.g. a PNG writer or encoder); None discards them after download.
    """

    def __init__(
        self,
        state: SceneState,
        cfg: RendererConfig,
        present_callback: Optional[Callable] = None,
        delta_present: bool = False,
    ):
        self.state = state
        self.cfg = cfg
        self.present_callback = present_callback
        if delta_present:
            # Dirty-tile present (runtime/delta.py): only changed tiles cross
            # the device->host link — the DXGI Present1 dirty-rects analog.
            from .delta import DeltaPresentQueue

            self.queue = DeltaPresentQueue(
                cfg.height, cfg.width, depth=cfg.frames_in_flight
            )
        else:
            self.queue = PresentQueue(depth=cfg.frames_in_flight)
        self.stats = FrameStats()

    def _present(self, host_frame):
        if host_frame is not None and self.present_callback is not None:
            self.present_callback(self.queue.frames_presented - 1, host_frame)

    def run(self, num_frames: int) -> FrameStats:
        t0 = time.perf_counter()
        for _ in range(num_frames):
            self.state, frame = dxr.step_frame_jit(self.state, self.cfg)
            self._present(self.queue.push(frame))
        for host in self.queue.drain():
            self._present(host)
        self.stats = FrameStats(
            frames=self.stats.frames + num_frames,
            elapsed_s=self.stats.elapsed_s + (time.perf_counter() - t0),
        )
        return self.stats


def save_frames_to_dir(out_dir: str):
    """A present_callback that writes frame_%05d.png into out_dir."""
    from ..utils import write_png

    os.makedirs(out_dir, exist_ok=True)

    def cb(i, frame):
        write_png(os.path.join(out_dir, f"frame_{i:05d}.png"), frame)

    return cb
