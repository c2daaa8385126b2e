"""The driver-facing entry points must stay green: entry() compiles
single-device; dryrun_multichip shards over the 8-device mesh."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_entry_single_device():
    fn, args = graft.entry()
    seg, max_id = jax.jit(fn)(*args)
    assert seg.shape == (128, 128)
    assert int(max_id) >= 1
