"""Driver-contract tests: __graft_entry__.entry and dryrun_multichip."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    w, h = jax.block_until_ready(out)
    assert w.shape == (2048, 256) and h.shape == (256, 2048)
    assert np.all(np.isfinite(np.asarray(w)))


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)  # conftest provides 8 CPU devices


def test_dryrun_multichip_nonpow2():
    ge.dryrun_multichip(6)
