#!/usr/bin/env python3
"""Headline benchmark: closed-loop MPC solve latency on one TPU chip.

Runs the reference's flagship configuration -- IIWA-14 figure-eight
tracking with the full SQP-PCG solver in the loop at N=64 knots
(reference examples/track_iiwa_pcg.cu + include/mpcsim.cuh) -- on real
hardware and reports the median per-update SQP solve latency.  The
reference must fit each solve into a 2000 us real-time control budget
(reference include/common/settings.cuh:76-78,173-175); vs_baseline is
that budget divided by our latency (>1 = faster than real-time).

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def main() -> int:
    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.models.robot import iiwa14
    from mpcgpu_tpu.sim import simulate_mpc
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

    import jax

    n = 64
    budget_us = 2000.0
    timesteps = 32           # ~0.5 s of tracking ≈ 256 control updates

    fixtures = Path(__file__).resolve().parent / "tests" / "fixtures"
    xu, ee = load_fixture_pair(fixtures, 0, 0)
    model = iiwa14()
    cfg = SolverConfig.for_knots(n, sqp_max_iter=4)

    rec = simulate_mpc(
        model, cfg, xu, ee,
        pcg_exit_tol=5e-5,               # reference N=64 tuned tolerance
        warmup_iters=20,
        max_timesteps=timesteps,
        max_control_updates=timesteps * 16,
    )
    s = rec.summary()
    value = s["p50_sqp_time_us"]

    print(
        json.dumps(
            {
                "metric": f"iiwa_mpc_closed_loop_sqp_solve_latency_n{n}",
                "value": round(value, 1),
                "unit": "us",
                "vs_baseline": round(budget_us / value, 3),
                "detail": {
                    "device": str(jax.devices()[0]),
                    "avg_sqp_time_us": round(s["avg_sqp_time_us"], 1),
                    "p95_sqp_time_us": round(s["p95_sqp_time_us"], 1),
                    "avg_tracking_error_m": round(s["avg_tracking_error"], 4),
                    "final_tracking_error_m": round(s["final_tracking_error"], 4),
                    "avg_pcg_iters": round(s["avg_pcg_iters"], 2),
                    "pcg_max_exit_rate": round(s["pcg_max_exit_rate"], 4),
                    "control_updates": s["control_updates"],
                    "timesteps": s["timesteps"],
                    "budget_us": budget_us,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
