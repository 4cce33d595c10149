"""Dirty-tile delta presentation (runtime/delta.py): reconstruction must be
bit-identical to a full readback, static content must stop crossing the link,
and the queue must keep PresentQueue's fencing/FIFO contract."""
import os

import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.runtime import App, DeltaPresentQueue

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _scene(cfg):
    geo = dxr.build_scene_geometry(
        [
            dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False),
            dxr.load_obj(os.path.join(ASSETS, "pyramid.obj"), prefer_native=False),
        ]
    )
    return dxr.make_scene(geo, cfg)


def test_delta_reconstruction_bit_identical_over_animation():
    """Animated frames presented through deltas equal direct full readbacks."""
    cfg = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    state = _scene(cfg)
    q = DeltaPresentQueue(cfg.height, cfg.width, depth=2)
    direct, via_delta = [], []
    for _ in range(6):
        state, frame = dxr.step_frame_jit(state, cfg)
        direct.append(np.asarray(frame))
        out = q.push(frame)
        if out is not None:
            via_delta.append(out)
    via_delta.extend(q.drain())
    assert len(via_delta) == 6
    for d, v in zip(direct, via_delta):
        np.testing.assert_array_equal(d, v)


def test_delta_static_frames_transfer_nothing():
    """Pushing the identical frame twice: the second present moves only the
    count scalar — zero tiles."""
    frame = jnp.tile(
        jnp.arange(64 * 3, dtype=jnp.uint8).reshape(1, 64, 3), (16, 1, 1)
    )
    q = DeltaPresentQueue(16, 64, depth=1)
    q.push(frame)
    first = q.present_next()
    np.testing.assert_array_equal(first, np.asarray(frame))
    moved_after_first = q.bytes_transferred
    q.push(frame)
    second = q.present_next()
    np.testing.assert_array_equal(second, np.asarray(frame))
    assert q.bytes_transferred - moved_after_first == 4  # the count scalar
    assert q.bytes_full == 2 * 16 * 64 * 3


def test_delta_partial_change_moves_fraction():
    """Touching one tile's worth of pixels moves ~one pow2 bucket, not the
    frame."""
    base = jnp.zeros((32, 128, 3), jnp.uint8)
    q = DeltaPresentQueue(32, 128, depth=1, tile_h=8, tile_w=64)
    q.push(base)
    q.present_next()
    before = q.bytes_transferred
    touched = base.at[0, 0, 0].set(255)
    out = q.push(touched) or q.present_next()
    np.testing.assert_array_equal(out, np.asarray(touched))
    tile_bytes = 8 * 64 * 3
    # one changed tile -> pow2 bucket of 1 tile + the order vector + count
    assert q.bytes_transferred - before == tile_bytes + q.NT * 4 + 4
    assert q.bytes_transferred < q.bytes_full / 4


def test_delta_queue_depth_and_fifo():
    q = DeltaPresentQueue(8, 8, depth=3, tile_h=8, tile_w=8)
    outs = []
    for i in range(5):
        out = q.push(jnp.full((8, 8, 3), i, jnp.uint8))
        if out is not None:
            outs.append(int(out[0, 0, 0]))
    assert q.in_flight == 3
    assert outs == [0, 1]
    rest = [int(f[0, 0, 0]) for f in q.drain()]
    assert rest == [2, 3, 4]
    assert q.frames_presented == 5
    assert q.in_flight == 0


def test_delta_tile_fallback_divisors():
    """Non-divisible preferred tile sizes fall back to divisors, never break."""
    q = DeltaPresentQueue(30, 50, depth=1, tile_h=8, tile_w=64)
    assert 30 % q.th == 0 and 50 % q.tw == 0
    frame = jnp.ones((30, 50, 3), jnp.uint8)
    np.testing.assert_array_equal(q.push(frame) or q.present_next(), 1)


def test_app_delta_present_matches_plain():
    """App(delta_present=True) delivers the same frames as the plain queue."""
    cfg = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    plain, delta = [], []
    app = App(_scene(cfg), cfg, present_callback=lambda i, f: plain.append(f))
    app.run(4)
    app_d = App(
        _scene(cfg), cfg, present_callback=lambda i, f: delta.append(f),
        delta_present=True,
    )
    app_d.run(4)
    assert len(plain) == len(delta) == 4
    for p, d in zip(plain, delta):
        np.testing.assert_array_equal(p, d)
    assert app_d.queue.bytes_transferred < app_d.queue.bytes_full
