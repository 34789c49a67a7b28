"""Experiment runner smoke test (dry-run scale)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "experiments"))


@pytest.mark.slow
def test_run_expr_dry(tmp_path, fixtures_dir):
    from runner import Settings, run_expr

    st = Settings(knot_points=(8,), max_timesteps=4, warmup_iters=1,
                  run_qdldl=True)
    res = run_expr(st, "dry", results_dir=tmp_path, fixtures_dir=fixtures_dir)
    assert 8 in res and "pcg" in res[8] and "qdldl" in res[8]
    assert (tmp_path / "dry" / "results.json").exists()
    assert res[8]["pcg"]["avg_tracking_error"] < 0.5


@pytest.mark.slow
def test_run_expr_timing_tiers_and_memory(tmp_path, fixtures_dir):
    """timing_mode routes to fine-grained phase timing (reference
    timing_mode MINIMAL/LINSYS/FINE_GRAINED, runner.py:38-58) and
    sample_memory wires up the MemorySampler (run_mpcgpu.sh:64-96)."""
    from runner import Settings, run_expr

    st = Settings(knot_points=(8,), max_timesteps=3, warmup_iters=1,
                  timing_mode="fine_grained", sample_memory=True)
    res = run_expr(st, "tiers", results_dir=tmp_path,
                   fixtures_dir=fixtures_dir)
    s = res[8]["pcg"]
    assert set(s["phase_times_us"]) == {
        "kkt", "schur", "linsys", "dz", "line_search"}
    assert all(v["avg"] > 0 for v in s["phase_times_us"].values())
    assert "peak_device_bytes" in s and s["memory_samples"] >= 1
    # phase-split executables are labelled so their latencies are not
    # silently compared with the fused "minimal" tier's
    assert s["timed_executable"] == "phase_split"

    st_lin = Settings(knot_points=(8,), max_timesteps=3, warmup_iters=1,
                      timing_mode="linsys")
    res = run_expr(st_lin, "tiers_lin", results_dir=tmp_path,
                   fixtures_dir=fixtures_dir)
    assert set(res[8]["pcg"]["phase_times_us"]) == {"linsys"}


def test_memory_sampler_collects():
    """MemorySampler (the launcher's nvidia-smi --loop-ms analogue) must
    record periodic samples and survive backends without memory_stats."""
    import time

    from mpcgpu_tpu.utils.meminfo import MemorySampler, device_memory_stats

    stats = device_memory_stats()
    assert isinstance(stats, dict)
    with MemorySampler(interval_ms=20.0) as s:
        time.sleep(0.15)
    assert len(s.samples) >= 3
    assert {"t_s", "bytes_in_use", "peak_bytes_in_use"} <= set(s.samples[0])
    float(s.peak_bytes())  # nan allowed off-TPU, must not raise


@pytest.mark.slow
def test_stage_latencies(iiwa, fixtures_dir):
    import jax.numpy as jnp

    from mpcgpu_tpu.config import SolverConfig
    from mpcgpu_tpu.utils.profiling import stage_latencies
    from mpcgpu_tpu.utils.trajfiles import load_fixture_pair, horizon_slices

    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    X, U, goals, xs = horizon_slices(xu, ee, 8)
    cfg = SolverConfig.for_knots(8)
    out = stage_latencies(
        iiwa, cfg, jnp.asarray(X), jnp.asarray(U), jnp.asarray(goals),
        jnp.asarray(xs), reps=2,
    )
    for key in ("kkt_us", "schur_us", "pcg_while_loop_us", "pcg_pallas_us",
                "dz_us", "line_search_us"):
        assert out[key] > 0
    assert out["pcg_iters"] > 0
