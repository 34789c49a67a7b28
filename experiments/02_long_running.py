#!/usr/bin/env python3
"""Long-running baseline with the QDLDL oracle comparison.

Rebuild of reference experiments/02_long_running.py: full-trajectory
tracking at each knot count, PCG vs the exact LDL' oracle.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from runner import Settings, init_runner, run_expr  # noqa: E402

if __name__ == "__main__":
    st = init_runner(Settings(run_qdldl=True))
    run_expr(st, "02_long_running")
