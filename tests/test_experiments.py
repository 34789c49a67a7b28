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
