"""Native threaded frame sink: PNGs written match the Python reference writer."""
import os

import numpy as np
import pytest

from d3d12_deferred_renderer_tpu.runtime.native_sink import (
    NativeFrameSink,
    native_sink_available,
)
from d3d12_deferred_renderer_tpu.utils import read_png

pytestmark = pytest.mark.skipif(
    not native_sink_available(), reason="native toolchain unavailable"
)


def test_sink_writes_exact_frames(tmp_path):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (24, 32, 3), np.uint8) for _ in range(6)]
    with NativeFrameSink(str(tmp_path), 32, 24, 3, queue_depth=2, num_threads=3) as sink:
        for i, f in enumerate(frames):
            sink.push(f, i)
        sink.flush()
        assert sink.frames_written == 6
        assert sink.errors == 0
    for i, f in enumerate(frames):
        got = read_png(str(tmp_path / f"frame_{i:05d}.png"))
        np.testing.assert_array_equal(got, f)


def test_sink_backpressure_bounded(tmp_path):
    """Pushing more frames than the queue depth must not drop or reorder any."""
    with NativeFrameSink(str(tmp_path), 128, 64, 3, queue_depth=1, num_threads=1) as sink:
        for i in range(20):
            sink.push(np.full((64, 128, 3), i, np.uint8), i)
        sink.flush()
        assert sink.frames_written == 20
    for i in range(20):
        got = read_png(str(tmp_path / f"frame_{i:05d}.png"))
        assert (got == i).all()


def test_sink_rejects_bad_config_and_guards_closed_handle(tmp_path):
    """channels=2 has no PNG color type (would write a corrupt file); use
    after close() must raise instead of passing NULL into the C ABI."""
    with pytest.raises(ValueError):
        NativeFrameSink(str(tmp_path), 8, 8, channels=2)
    with pytest.raises(ValueError):
        NativeFrameSink(str(tmp_path), 0, 8, channels=3)
    sink = NativeFrameSink(str(tmp_path), 8, 8, channels=3)
    sink.push(np.zeros((8, 8, 3), np.uint8), 0)
    sink.close()
    with pytest.raises(RuntimeError):
        sink.push(np.zeros((8, 8, 3), np.uint8), 1)
    with pytest.raises(RuntimeError):
        sink.flush()
    with pytest.raises(RuntimeError):
        _ = sink.frames_written
    sink.close()  # idempotent


def test_sink_with_app(tmp_path):
    import d3d12_deferred_renderer_tpu as dxr
    from d3d12_deferred_renderer_tpu.runtime import App

    assets = os.path.join(os.path.dirname(__file__), "..", "assets", "models")
    cfg = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(assets, "cube.obj"), prefer_native=False)]
    )
    state = dxr.make_scene(geo, cfg)
    with NativeFrameSink(str(tmp_path), 96, 48, 3) as sink:
        app = App(state, cfg, present_callback=sink.as_present_callback())
        app.run(4)
        sink.flush()
        assert sink.frames_written == 4
    assert (tmp_path / "frame_00003.png").exists()
