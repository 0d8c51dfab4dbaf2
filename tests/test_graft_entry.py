"""The driver's entry points must keep working — they are run verbatim.

Round 1's only red driver artifact was `dryrun_multichip` failing in the
driver environment (MULTICHIP_r01.json); nothing in the suite had called
it. These tests call the real functions from __graft_entry__.py so a
regression is caught before the driver sees it.

`dryrun_multichip` self-provisions an 8-device virtual CPU platform when no
backend is up; under pytest the conftest has already provisioned exactly
that, so `_provision_virtual_devices` takes its already-initialized
fallback path — the same path a driver that pre-touches devices would hit.
"""

import jax


def test_entry_forward_lowers():
    # Trace + lower only: executing the 24-layer base model through
    # interpret-mode Pallas on one CPU core takes tens of minutes; lowering
    # catches the trace/shape/lowering regressions and the driver executes
    # the jit on the real chip.
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    out_shape = lowered.out_info
    assert jax.tree.leaves(out_shape)[0].shape == (8, 527)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally (finite loss, step+1, SP)
