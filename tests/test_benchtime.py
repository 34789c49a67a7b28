"""The pipelined-dispatch slope must recover per-unit cost exactly when
the measurement is a constant plus work (the remote-attachment model)."""
import numpy as np

from mpcgpu_tpu.utils.benchtime import pipelined_slope_us


class _FakeClock:
    """Deterministic stand-in: each run_fn costs work_s, each sync adds
    const_s, modelled by advancing a virtual clock read by time.perf_counter
    monkeypatching."""

    def __init__(self, work_s, const_s):
        self.t = 0.0
        self.work_s = work_s
        self.const_s = const_s

    def perf_counter(self):
        return self.t


def test_slope_cancels_constant(monkeypatch):
    clk = _FakeClock(work_s=0.010, const_s=0.030)

    import mpcgpu_tpu.utils.benchtime as bt

    monkeypatch.setattr(bt.time, "perf_counter", clk.perf_counter)

    def run_fn():
        clk.t += clk.work_s
        return "out"

    def sync_fn(out):
        assert out == "out"
        clk.t += clk.const_s

    units = 100
    per_unit, const, wall1, wallm = pipelined_slope_us(
        run_fn, sync_fn, units, m_hi=4, repeats=2)
    # work_s per dispatch over `units` units -> 100 us/unit exactly
    np.testing.assert_allclose(per_unit, clk.work_s * 1e6 / units, rtol=1e-9)
    np.testing.assert_allclose(const, 30_000.0, rtol=1e-9)
    assert wall1 < wallm
