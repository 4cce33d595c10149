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
    """Pushing the identical frame repeatedly: once the speculative cap has
    decayed (one clean present), every further present moves ONLY the 4-byte
    count — one transfer, zero tiles."""
    frame = jnp.tile(
        jnp.arange(64 * 3, dtype=jnp.uint8).reshape(1, 64, 3), (16, 1, 1)
    )
    q = DeltaPresentQueue(16, 64, depth=1)
    q.push(frame)
    first = q.present_next()
    np.testing.assert_array_equal(first, np.asarray(frame))
    # Present 2 is clean but still carries the warm speculative prefix
    # (sized by present 1's full-dirty count); it decays the cap to 0.
    q.push(frame)
    np.testing.assert_array_equal(q.present_next(), np.asarray(frame))
    moved = q.bytes_transferred
    q.push(frame)
    third = q.present_next()
    np.testing.assert_array_equal(third, np.asarray(frame))
    assert q.bytes_transferred - moved == 4  # the count scalar, one transfer
    assert q.transfer_misses == 0
    assert q.bytes_full == 3 * 16 * 64 * 3


def test_delta_partial_change_moves_fraction():
    """RAW protocol (pixel_level=False): touching one tile's worth of pixels
    per frame converges to ONE small transfer: the speculative prefix of one
    tile + its order entry + the count — never the frame."""
    base = jnp.zeros((32, 128, 3), jnp.uint8)
    q = DeltaPresentQueue(
        32, 128, depth=1, tile_h=8, tile_w=64, pixel_level=False
    )
    q.push(base)
    q.present_next()
    tile_bytes = 8 * 64 * 3
    # Keep touching one tile; after the first present the cap tracks c=1.
    for i in range(10):
        touched = base.at[0, 0, 0].set(100 + i)
        before = q.bytes_transferred
        out = q.push(touched) or q.present_next()
        np.testing.assert_array_equal(out, np.asarray(touched))
    # Steady state: cap = bucket(1.15 * 1 + 1) = 2 tiles of speculative
    # prefix + their order entries + the count — one transfer.
    assert q.bytes_transferred - before == 4 + 2 * 4 + 2 * tile_bytes
    # Cumulative (incl. the unavoidable full first present) stays a fraction.
    assert q.bytes_transferred < q.bytes_full / 3


def test_delta_speculation_miss_still_bit_identical():
    """A frame far dirtier than the speculative cap (settled scene, then a
    full-frame change) takes the miss path — an extra transfer, never a wrong
    pixel."""
    base = jnp.zeros((32, 128, 3), jnp.uint8)
    q = DeltaPresentQueue(32, 128, depth=1, tile_h=8, tile_w=64)
    q.push(base)
    q.present_next()
    q.push(base)
    q.present_next()  # clean present decays the cap to 0
    big = jnp.full((32, 128, 3), 77, jnp.uint8)
    out = q.push(big) or q.present_next()
    np.testing.assert_array_equal(out, np.asarray(big))
    assert q.transfer_misses == 1


def test_delta_pixel_mode_steady_state_bytes():
    """PIXEL-level protocol (the default): once calibrated, a single changed
    pixel per frame moves the 8-byte header + the tile-order prefix + the
    per-tile bitmaps + ~one pixel — far below one raw tile."""
    base = jnp.zeros((32, 128, 3), jnp.uint8)
    q = DeltaPresentQueue(32, 128, depth=1, tile_h=8, tile_w=64)
    assert q.pixel_level
    q.push(base)
    q.present_next()
    # Run past the cap-shrink hysteresis (_SHRINK_RUN consecutive low
    # observations) so the seeded pixel cap settles to the observed count.
    for i in range(q._SHRINK_RUN + 8):
        touched = base.at[0, 0, 0].set(100 + i)
        before = q.bytes_transferred
        out = q.push(touched) or q.present_next()
        np.testing.assert_array_equal(out, np.asarray(touched))
    tile_bytes = 8 * 64 * 3
    steady = q.bytes_transferred - before
    # cap settles at 2 tiles; the pixel payload is quarter-density-padded
    # (one program per tile bucket): 8B header + 2x4B order + 2x64B bitmaps
    # + (2*512//4)x3B pixels = 912 B — well under one raw 1536 B tile, and
    # a third of the raw protocol's 3084 B for the same frame stream.
    assert steady == 8 + 2 * 4 + 2 * (8 * 64 // 8) + (2 * 512 // 4) * 3
    assert steady < tile_bytes


def test_delta_pixel_mode_bit_identical_over_animation():
    """Animated frames through the pixel-level protocol equal full readbacks
    (the raw-protocol twin of test_delta_reconstruction_bit_identical...)."""
    cfg = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    state = _scene(cfg)
    q = DeltaPresentQueue(cfg.height, cfg.width, depth=2)
    assert q.pixel_level
    direct, via = [], []
    for _ in range(8):
        state, frame = dxr.step_frame_jit(state, cfg)
        direct.append(np.asarray(frame))
        out = q.push(frame)
        if out is not None:
            via.append(out)
    via.extend(q.drain())
    assert len(via) == 8
    for d, v in zip(direct, via):
        np.testing.assert_array_equal(d, v)
    # The protocol must actually have engaged pixel mode at least once (the
    # animated scene changes a fraction of each dirty tile's pixels).
    assert q.bytes_transferred < q.bytes_full


def test_delta_pixel_speculation_miss_still_bit_identical():
    """A frame whose changed-PIXEL count blows past the calibrated pixel cap
    (while staying under the tile cap) takes the pixel-miss path — an extra
    transfer of the affected tiles, never a wrong pixel."""
    base = jnp.zeros((32, 128, 3), jnp.uint8)
    q = DeltaPresentQueue(32, 128, depth=1, tile_h=8, tile_w=64)
    q.push(base)
    q.present_next()
    # Calibrate past the shrink hysteresis: presents with ONE changed pixel
    # settle px_cap ~= 2.
    cur = base
    for i in range(q._SHRINK_RUN + 4):
        cur = base.at[0, 0, 0].set(10 + i)
        out = q.push(cur) or q.present_next()
        np.testing.assert_array_equal(out, np.asarray(cur))
    misses = q.transfer_misses
    # Now change EVERY pixel of that one tile: c=1 <= tile cap, npx=512 >> 2.
    big = cur.at[:8, :64, :].set(200)
    out = q.push(big) or q.present_next()
    np.testing.assert_array_equal(out, np.asarray(big))
    assert q.transfer_misses == misses + 1


def test_delta_dense_change_scene_falls_back_to_raw():
    """A scene whose dirty tiles change nearly EVERY pixel each frame pays at
    most one pixel-miss: the observed count then exceeds the quarter-density
    payload and _px_mode keeps choosing the raw buffer (which is cheaper for
    dense change) until the density drops again."""
    base = jnp.zeros((32, 128, 3), jnp.uint8)
    q = DeltaPresentQueue(32, 128, depth=1, tile_h=8, tile_w=64)
    q.push(base)
    q.present_next()
    cur = base
    for i in range(6):
        # Rewrite one full tile's pixels every frame: density 100% >> 25%.
        cur = cur.at[:8, :64, :].set(50 + i)
        out = q.push(cur) or q.present_next()
        np.testing.assert_array_equal(out, np.asarray(cur))
    # At most one calibration miss; every steady present is exact.
    assert q.transfer_misses <= 2
    # Steady state must be raw (px would miss every frame): estimate exceeds
    # the quarter-density cap.
    assert q._spec_px > max(1, q._spec * q.tile_px // 4)


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
    # This animated tiny scene dirties ~every tile every frame.  The
    # pixel-level buffer is only chosen when its static size undercuts the
    # raw one (+4B header), so the total stays bounded by a full readback
    # plus headers; a pixel-cap calibration miss may add one bounded
    # re-transfer while the observed count takes over.
    q = app_d.queue
    assert q.transfer_misses <= 1
    assert q.bytes_transferred <= q.bytes_full + 4 * (8 + q.NT * 4) + (
        q.transfer_misses * q.NT * q.tile_bytes
    )
