"""Driver contract: entry() compile-check and multi-chip dry run."""

import sys

import jax

sys.path.insert(0, "/root/repo")


def test_entry_jits():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1000,)  # full ResNet-50 logits (bench mode 16)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
