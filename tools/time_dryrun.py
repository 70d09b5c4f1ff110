"""Time __graft_entry__.dryrun_multichip(8) against the driver budget.

The round-4 dryrun proved correct but took 25.4 min of cold CPU
compiles, blowing the driver timeout and turning MULTICHIP_r04.json
red. This tool is the regression wall: it must finish well inside the
budget or exit non-zero.

Usage: python tools/time_dryrun.py [budget_seconds]   (default 300)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

budget = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0

import __graft_entry__ as g  # noqa: E402

t0 = time.perf_counter()
g.dryrun_multichip(8)
wall = time.perf_counter() - t0
line = {"metric": "dryrun_multichip_wall", "value": round(wall, 1),
        "unit": "s", "budget": budget, "ok": wall <= budget}
import json  # noqa: E402

print(json.dumps(line))
if wall > budget:
    sys.exit(1)
