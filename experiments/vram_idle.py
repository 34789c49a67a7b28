#!/usr/bin/env python3
"""Idle device-memory probe.

Rebuild of reference experiments/vram_idle.py:1-8 (which launches the
binary with the memory sampler attached but no workload): initialize the
backend, sample device memory for a short window, archive the baseline
footprint.  Run under the default (TPU) env or with --cpu.

    python experiments/vram_idle.py [--cpu] [--seconds 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpcgpu_tpu.utils.meminfo import MemorySampler, device_memory_stats

    dev = jax.devices()[0]
    # touch the device so the client allocates its baseline state
    jax.numpy.zeros(8).block_until_ready()

    with MemorySampler(interval_ms=100.0) as sampler:
        time.sleep(args.seconds)

    result = {
        "device": str(dev),
        "samples": len(sampler.samples),
        "peak_bytes": sampler.peak_bytes(),
        "stats_now": device_memory_stats(dev),
    }
    out = Path(args.out) if args.out else (
        REPO / "results" / f"vram_idle_{dev.platform}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=1, default=str))
    print(json.dumps(result, default=str))


if __name__ == "__main__":
    main()
