"""Device memory usage sampling.

Equivalent of the reference's GPU-memory sampler
(reference run_mpcgpu.sh:64-96: nvidia-smi --loop-ms + pmon around the
experiment run, and the vram_load/idle probes in experiments/).  Uses the
PJRT per-device memory statistics where the backend exposes them.
"""
from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import jax


def device_memory_stats(device=None) -> Dict[str, int]:
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    return dict(stats) if stats else {}


def process_memory_stats(pid: Optional[int] = None) -> Dict[str, float]:
    """Per-PROCESS host memory usage (RSS / high-water mark, MB).

    TPU analogue of the reference launcher's per-process GPU sampler
    (reference run_mpcgpu.sh:64-96 `nvidia-smi pmon` alongside the
    device-level loop): the device side has no per-process split on
    TPU (one process owns the chip), so the per-process axis that
    remains meaningful is host memory -- read from /proc/<pid>/status
    (stdlib-only; psutil is not in this image)."""
    import os
    from pathlib import Path

    pid = pid or os.getpid()
    out: Dict[str, float] = {}
    try:
        for line in Path(f"/proc/{pid}/status").read_text().splitlines():
            if line.startswith(("VmRSS:", "VmHWM:", "VmSize:")):
                key, val = line.split(":", 1)
                out[{"VmRSS": "rss_mb", "VmHWM": "rss_peak_mb",
                     "VmSize": "vsize_mb"}[key]] = (
                    float(val.strip().split()[0]) / 1024.0)
    except OSError:
        pass
    return out


class MemorySampler:
    """Background sampler: records bytes_in_use every interval_ms,
    like `nvidia-smi --loop-ms=500` in the reference launcher."""

    def __init__(self, interval_ms: float = 500.0, device=None):
        self.interval = interval_ms / 1e3
        self.device = device or jax.devices()[0]
        self.samples: List[Dict[str, float]] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _run(self):
        t0 = time.time()
        while not self._stop.is_set():
            s = device_memory_stats(self.device)
            p = process_memory_stats()
            self.samples.append(
                {"t_s": time.time() - t0,
                 "bytes_in_use": s.get("bytes_in_use", float("nan")),
                 "peak_bytes_in_use": s.get("peak_bytes_in_use",
                                            float("nan")),
                 "proc_rss_mb": p.get("rss_mb", float("nan"))}
            )
            self._stop.wait(self.interval)

    def __enter__(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2.0)

    def peak_bytes(self) -> float:
        vals = [s["peak_bytes_in_use"] for s in self.samples
                if s["peak_bytes_in_use"] == s["peak_bytes_in_use"]]
        return max(vals) if vals else float("nan")

    def peak_proc_rss_mb(self) -> float:
        vals = [s.get("proc_rss_mb", float("nan")) for s in self.samples]
        vals = [v for v in vals if v == v]
        return max(vals) if vals else float("nan")
