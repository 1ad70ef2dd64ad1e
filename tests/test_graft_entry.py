"""Driver entry points: single-device compile of entry() and the
multi-chip dry run on the virtual CPU mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 4
    mu, logvar, boxes, angles = out
    assert boxes.shape[-1] == 6
    assert angles.shape[-1] == 24


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    assert jax.device_count() >= 8
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
