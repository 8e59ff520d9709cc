"""Driver-facing dryrun contract (VERDICT round-4 next #1).

MULTICHIP_r04 failed rc=124/tail="" because the dryrun outgrew the
driver's time budget AND buffered all evidence until completion.  This
pins both fixes:

- ``dryrun_multichip(8)`` finishes within a wall-clock budget on this
  1-core box (idle target <=3 min; the budget leaves contention margin);
- the three stage-OK lines are STREAMED (printed by the parent as the
  child earns them), so a mid-run kill still leaves durable evidence.

Runs the real subprocess path — the same thing the driver invokes.
"""
import os
import time

import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="spawns an 8-virtual-device CPU subprocess; run via "
           "scripts/test_cpu.sh")

# Idle runtime is ~2-3 min; contention (the rest of the suite, a chip
# campaign's host side) can roughly double it.  Regressing past this
# budget means the driver artifact is at risk again.
BUDGET_S = float(os.environ.get("DRYRUN_BUDGET_S", 600))


def test_dryrun_multichip_within_budget(capfd):
    import __graft_entry__ as ge

    t0 = time.time()
    ge.dryrun_multichip(8)
    elapsed = time.time() - t0
    out, _ = capfd.readouterr()
    assert "dryrun_multichip(8): loss=" in out and "OK" in out
    assert "2d-mesh (2 data x 2 seq): loss=" in out
    assert "batched-submit (8 lanes / 8 devices" in out
    assert elapsed < BUDGET_S, (
        f"dryrun took {elapsed:.0f}s (budget {BUDGET_S:.0f}s) — the driver "
        f"artifact (MULTICHIP_rNN.json) will time out again")
