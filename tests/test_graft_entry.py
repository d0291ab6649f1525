"""Driver entry-point contract tests on the 8-virtual-device CPU mesh."""
import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    X, logpi = out
    assert np.isfinite(np.asarray(logpi)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
