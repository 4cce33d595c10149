"""Runtime tests: present queue fencing semantics, app frame loop, profiler."""
import os

import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.runtime import App, PassProfiler, PresentQueue
from d3d12_deferred_renderer_tpu.runtime.app import save_frames_to_dir

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def test_present_queue_depth_and_order():
    q = PresentQueue(depth=3)
    outs = []
    for i in range(5):
        out = q.push(jnp.full((2, 2), i, jnp.int32))
        if out is not None:
            outs.append(int(out[0, 0]))
    assert q.in_flight == 3          # bounded: never more than depth in flight
    assert outs == [0, 1]            # oldest presented first (FIFO, like FLIP)
    rest = [int(f[0, 0]) for f in q.drain()]
    assert rest == [2, 3, 4]
    assert q.frames_presented == 5
    assert q.in_flight == 0


def test_app_runs_and_presents_all_frames(tmp_path):
    cfg = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)]
    )
    state = dxr.make_scene(geo, cfg)
    presented = []
    app = App(state, cfg, present_callback=lambda i, f: presented.append((i, f)))
    stats = app.run(5)
    assert stats.frames == 5
    assert len(presented) == 5
    assert presented[0][1].shape == (48, 96, 3)
    assert [i for i, _ in presented] == list(range(5))
    # Animation progressed in the retained state.
    assert float(app.state.time) > 0.04


def test_save_frames_callback(tmp_path):
    cb = save_frames_to_dir(str(tmp_path))
    cb(0, np.zeros((4, 4, 3), np.uint8))
    assert (tmp_path / "frame_00000.png").exists()


def test_profiler_accumulates():
    prof = PassProfiler()
    x = jnp.ones((64, 64))
    with prof.time_pass("matmul", x):
        y = x @ x
    with prof.time_pass("matmul", y):
        y = y @ y
    s = prof.summary()
    assert "matmul" in s and s["matmul"] >= 0.0
    prof.reset()
    assert prof.summary() == {}
