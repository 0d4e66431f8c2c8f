"""Regression guard for the driver's multi-chip dryrun.

Round 1 shipped a dryrun that failed in the driver (tracer leak through the
plaintext LRU cache, MULTICHIP_r01.json ok=false); this test runs the exact
driver entry point `__graft_entry__.dryrun_multichip(8)` on the 8 virtual
CPU devices the conftest provides, so the sharded path can never silently
regress again.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8(capsys):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "sharded sort step OK" in out
