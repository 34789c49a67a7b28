#!/usr/bin/env python3
"""Preconditioning ablation + knot sweep.

Rebuild of reference experiments/01_precond_then_long_running.py: runs the
stair-preconditioned PCG configuration against the no-preconditioner
ablation over the knot sweep, then the long-running baseline.
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from runner import Settings, init_runner, run_expr  # noqa: E402

if __name__ == "__main__":
    base = init_runner(Settings(knot_points=(16, 32, 64, 128)))
    run_expr(base, "01a_preconditioned")
    run_expr(
        dataclasses.replace(base, enable_preconditioning=False,
                            pcg_max_iters=1000),
        "01b_no_preconditioner",
    )
