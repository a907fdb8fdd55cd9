"""The driver entry points must always import and run.

entry() is compile-checked single-chip by the driver; dryrun_multichip
exercises the mesh-sharded path on the virtual CPU device grid set up in
conftest.py. These used to be validated only by the driver — a renamed op
broke dryrun_multichip silently once, hence this test.
"""
import pytest

import jax

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make check-fast`


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))
