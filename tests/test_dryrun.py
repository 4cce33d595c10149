"""The driver's multichip dry run, executed VERBATIM by the test suite.

Round-4 lesson (VERDICT.md): the recorded MULTICHIP artifact shipped red
because the 3-axis mesh + shadows + bloom + FXAA composition had never been
run by a test — the driver was its first executor.  These tests call the SAME
d3d12_deferred_renderer_tpu/parallel/dryrun.py helpers the driver's
__graft_entry__.dryrun_multichip delegates to, on the same 8-device virtual
CPU mesh, so a future MULTICHIP:false is preceded by a test failure by
construction.
"""
import jax
import pytest

from d3d12_deferred_renderer_tpu.parallel import dryrun

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
def test_dryrun_staged_step():
    dryrun.run_staged(8)


@needs_8
def test_dryrun_interpret_step():
    dryrun.run_interpret(8)


@needs_8
def test_dryrun_three_axis_step():
    """The exact composition that failed in round 4: ('frame', 'tri', 'rows')
    mesh declaration (tri before rows — NOT the band flattening order) with
    the full shadows + bloom + FXAA stack."""
    dryrun.run_three_axis(8)
