"""Multi-device (virtual CPU mesh) tests for the training step."""

import numpy as np

import jax


class TestMultiChip:

    def test_dryrun_8_devices(self):
        import __graft_entry__ as g
        assert len(jax.devices()) >= 8
        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out))
