"""BandAxes (parallel/sharded.py): the flat band-axis handle must flatten in
its OWN major->minor order regardless of mesh declaration order.

Round-4 defect: jax.lax.ppermute flattens a tuple axis in MESH-DECLARATION
order while axis_index/all_gather/out_specs follow tuple order, so the FXAA
halo scrambled on a mesh declared ('tri', 'rows').  BandAxes composes
single-axis collectives explicitly; these unit tests pin that convention on
both declaration orders so any future collective added to the handle gets the
same scrutiny cheaply (the end-to-end renders in test_tri_sharded.py take
minutes; these take seconds)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from d3d12_deferred_renderer_tpu.parallel.sharded import BandAxes

needs_4 = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


def _mesh(names):
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    return Mesh(devs, names)


@needs_4
@pytest.mark.parametrize("names", [("rows", "tri"), ("tri", "rows")])
def test_band_index_is_rows_major(names):
    axes = BandAxes(("rows", "tri"), (2, 2))

    def fn(_):
        return axes.index()[None]

    out = jax.shard_map(
        fn, mesh=_mesh(names), in_specs=P(),
        out_specs=P(("rows", "tri")), check_vma=False,
    )(jnp.zeros(()))
    # out_specs tuple entries flatten in TUPLE order (rows major), so a
    # rows-major index() must read 0..3 in place — on EITHER mesh order.
    np.testing.assert_array_equal(np.asarray(out), [0, 1, 2, 3])


@needs_4
@pytest.mark.parametrize("names", [("rows", "tri"), ("tri", "rows")])
def test_band_all_gather_tiled_is_rows_major(names):
    axes = BandAxes(("rows", "tri"), (2, 2))

    def fn(_):
        mine = (10 * jax.lax.axis_index("rows")
                + jax.lax.axis_index("tri"))[None]
        return axes.all_gather_tiled(mine)[None]

    out = jax.shard_map(
        fn, mesh=_mesh(names), in_specs=P(),
        out_specs=P(("rows", "tri"), None), check_vma=False,
    )(jnp.zeros(()))
    # Every band gathers the same rows-major sequence.
    for row in np.asarray(out):
        np.testing.assert_array_equal(row, [0, 1, 10, 11])


@needs_4
def test_band_axes_single_axis():
    axes = BandAxes(("rows",), (4,))
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("rows",))

    def fn(_):
        i = axes.index()
        return i[None], axes.all_gather_tiled(i[None])[None]

    idx, gath = jax.shard_map(
        fn, mesh=mesh, in_specs=P(),
        out_specs=(P("rows"), P("rows", None)), check_vma=False,
    )(jnp.zeros(()))
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])
    for row in np.asarray(gath):
        np.testing.assert_array_equal(row, [0, 1, 2, 3])
    assert axes.total == 4
    assert axes.psum_axes == "rows"
    assert axes.spec == "rows"