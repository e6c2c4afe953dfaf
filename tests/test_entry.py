"""Driver-contract tests for __graft_entry__.py.

The multichip dryrun is the framework's ONE external multi-chip artifact:
the driver runs it cold with a hard wall-clock budget, so this suite
time-boxes it the same way (round-4 regression: a second whole-program
XLA:CPU compile pushed the cold dryrun past the driver budget —
MULTICHIP_r04 rc=124).
"""
import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# cold-compile budget (seconds).  The driver allows ~590 s; asserting well
# under it here keeps headroom for slower hosts.  Measured on the round-5
# host: ~107 s for the tiny-arch DP step alone, ~3 min for the full dryrun
# (DP step + mesh-accum step + scene-shard leg), cold, no persistent cache.
DRYRUN_BUDGET_S = 480


def test_dryrun_multichip_cold_within_budget():
    """Run the REAL driver entry end-to-end: re-execs a clean CPU child
    with an 8-device virtual mesh and no persistent compilation cache
    (i.e. genuinely cold), exactly as the driver does."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    t0 = time.time()
    g.dryrun_multichip(8)
    dt = time.time() - t0
    assert dt < DRYRUN_BUDGET_S, (
        f"dryrun_multichip(8) took {dt:.0f}s cold — over the {DRYRUN_BUDGET_S}s "
        "budget; the driver WILL time out (see MULTICHIP_r04)")


def test_entry_forward_compiles():
    """entry() must return a jittable forward + example args (the driver's
    single-chip compile check).  Runs on whatever backend the suite uses
    (CPU mesh under tests/conftest.py)."""
    sys.path.insert(0, REPO)
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
