"""The driver contract: entry() compiles, dryrun_multichip(8) runs on the
virtual CPU mesh (dp=4 x tp=2 with real GSPMD shardings)."""

import sys
import os

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import pytest


def test_entry_shapes():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 4, 64, 64)


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
