"""Driver entry points stay importable and runnable (CPU)."""
import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss, grads = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jax.numpy.all(jax.numpy.isfinite(leaf)))


def test_dryrun_multichip_inprocess():
    import __graft_entry__ as g

    # under the test env the 8 fake devices exist, so this runs in-process
    g.dryrun_multichip(len(jax.devices()))
