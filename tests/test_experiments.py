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
