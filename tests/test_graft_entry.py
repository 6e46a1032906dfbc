"""Guard the driver contract: entry() compiles, dryrun_multichip runs."""

import jax
import pytest


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
