"""Driver entry points run under the test harness too (8 virtual CPU devices)."""

import jax
import pytest


def test_dryrun_multichip_8_devices():
    assert len(jax.devices()) >= 8
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    frame, eos, offset = out
    assert frame.shape == (1, 1, 32)
    assert eos.shape == (1,)
    assert int(offset) == 1
