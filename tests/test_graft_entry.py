"""Driver contract: entry() compiles single-device; dryrun_multichip runs
a full sharded train step on the 8-device CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def _load_graft():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    return ge


def test_entry_jittable():
    ge = _load_graft()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 100)
    assert bool(jnp.isfinite(out).all())


def test_dryrun_multichip_8():
    ge = _load_graft()
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge = _load_graft()
    ge.dryrun_multichip(2)
