#!/usr/bin/env python3
"""Loaded device-memory probe at the largest horizon.

Rebuild of reference experiments/vram_load_512.py:1-9 (a 1000-iteration
N=512 run wrapped by the launcher's memory sampler): runs repeated N=512
SQP solves under the MemorySampler and archives the peak device-memory
footprint.

    python experiments/vram_load_512.py [--cpu] [--knots 512] [--solves 10]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--knots", type=int, default=512)
    ap.add_argument("--solves", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import __graft_entry__ as g
    from mpcgpu_tpu.config import PCGConfig, SolverConfig
    from mpcgpu_tpu.sqp import sqp_solve
    from mpcgpu_tpu.utils.meminfo import MemorySampler, device_memory_stats

    dev = jax.devices()[0]
    n = args.knots
    cfg = SolverConfig.for_knots(
        n, sqp_max_iter=4,
        pcg=PCGConfig(max_iter=PCGConfig.tpu_tuned_max_iter(n)))
    model, (X, U, lam, goals, xs) = g._problem(n)
    rho = jnp.asarray(1e-3, jnp.float32)
    tol = jnp.asarray(1e-4, jnp.float32)

    with MemorySampler(interval_ms=100.0) as sampler:
        res = None
        for _ in range(args.solves):
            res = sqp_solve(model, cfg, X, U,
                            res.lam if res is not None else lam,
                            goals, xs, rho, tol)
        np.asarray(res.stats.final_merit)  # hard sync

    result = {
        "device": str(dev),
        "knots": n,
        "solves": args.solves,
        "samples": len(sampler.samples),
        "peak_bytes": sampler.peak_bytes(),
        "stats_after": device_memory_stats(dev),
    }
    out = Path(args.out) if args.out else (
        REPO / "results" / f"vram_load_{n}_{dev.platform}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=1, default=str))
    print(json.dumps(result, default=str))


if __name__ == "__main__":
    main()
