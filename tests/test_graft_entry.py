"""Driver-contract tests: __graft_entry__ must keep compiling (the driver
compile-checks entry() single-chip and executes dryrun_multichip on N
virtual devices)."""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        fn, args = graft.entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))
        # untrained full softmax over 1100 entities: loss ~ ln(1100)
        assert abs(float(loss) - np.log(1100)) < 0.5

    def test_dryrun_multichip_8(self, capsys):
        graft.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    @pytest.mark.slow  # the driver runs the dryrun itself; the 8-device
    # case above is the meaningful in-suite gate, the 1-device degenerate
    # mesh just re-pays the full compile
    def test_dryrun_multichip_1(self, capsys):
        graft.dryrun_multichip(1)
        assert "OK" in capsys.readouterr().out
