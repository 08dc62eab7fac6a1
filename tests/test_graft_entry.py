"""Driver contract: entry() compiles; dryrun_multichip runs on the
virtual 8-device mesh."""

import sys

sys.path.insert(0, "/root/repo")

import jax


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
