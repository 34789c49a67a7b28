"""Honest device-time measurement over the remote-tunneled TPU.

Any host<->device fetch or dispatch round-trip on this attachment costs a
large CONSTANT (~30 ms) independent of the work dispatched, so
``wall / n_updates`` over a single scan dispatch inflates small per-update
latencies by hundreds of microseconds.  The fix used everywhere we publish
numbers: dispatch the SAME compiled program m times back-to-back (device
executes them sequentially; dispatches pipeline), fetch once, and take the
slope between m=1 and m=m_hi.  The constant (dispatch + fetch + host
bookkeeping) cancels; one compile serves both points.

This is the TPU analogue of the reference's warm-up-then-measure protocol
(reference include/mpcsim.cuh:259-279), which likewise excludes one-time
costs from the reported per-update time.
"""
from __future__ import annotations

import time


def pipelined_slope_us(run_fn, sync_fn, units_per_call: int, m_hi: int = 4,
                       repeats: int = 3):
    """Per-unit device time via the pipelined-dispatch slope.

    run_fn()  -> out     : dispatch one (already compiled) program
    sync_fn(out)         : force a hard sync (e.g. np.asarray of a leaf --
                           block_until_ready is not a hard sync here)
    units_per_call       : work units per dispatch (e.g. n_updates)

    Returns (us_per_unit, const_us, wall_1_us, wall_m_us): the slope, the
    inferred per-measurement constant, and the raw best-of-`repeats` walls.
    """
    run_fn()  # warm (and compile, if the caller hasn't already)

    def timed(m):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(m):
                out = run_fn()
            sync_fn(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e6

    wall_1 = timed(1)
    wall_m = timed(m_hi)
    per_unit = (wall_m - wall_1) / ((m_hi - 1) * units_per_call)
    const = wall_1 - per_unit * units_per_call
    return per_unit, const, wall_1, wall_m
