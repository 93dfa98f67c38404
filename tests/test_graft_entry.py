"""Driver-contract tests: entry() compiles, dryrun_multichip(8) runs."""
import jax
import numpy as np


def test_entry_jits():
    from __graft_entry__ import entry

    fn, example_args = entry()
    jitted = jax.jit(fn)
    depth, conf = jitted(*example_args)
    assert np.isfinite(np.asarray(depth)).all()
    assert depth.shape[1:3] == (128, 160)


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
