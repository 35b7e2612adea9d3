"""Multi-chip sharding dry run on the virtual 8-device CPU mesh."""

import sys

sys.path.insert(0, ".")


def test_entry_compiles_and_runs():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert bool(out["accepted"].all())


def test_dryrun_multichip_8():
    import jax

    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_dryrun_multichip_2():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)
