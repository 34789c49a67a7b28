"""linsys="auto": error-gated rho-bail failover from the tracking-grade
pcg backend to the exact-dual bcr_pcg backend (the operational rule from the
pair-1_0 diagnosis, RESULTS.md; no reference analogue -- the reference has a
single compile-time LINSYS_SOLVE choice, include/common/settings.cuh:126-131).
The latch requires BOTH the rho-bail EMA and the tracking-error EMA above
threshold (round-4: bails alone also fire on healthy pairs).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.config import SolverConfig
from mpcgpu_tpu.sim import (make_shift_schedule, simulate_mpc,
                            simulate_mpc_scan)
from mpcgpu_tpu.sqp import sqp_solve
from mpcgpu_tpu.utils.trajfiles import load_fixture_pair

N = 8          # power of 2: the bcr_pcg branch needs the BCR envelope
N_UPDATES = 8


def _scan_args(xu, ee):
    return (jnp.asarray(xu), jnp.asarray(ee),
            jnp.asarray(xu[:N, :14]), jnp.asarray(xu[: N - 1, 14:]),
            jnp.zeros((N, 14), jnp.float32), jnp.asarray(1e-3, jnp.float32),
            1e-5, N_UPDATES)


def test_auto_is_pcg_until_tripped(iiwa, fixtures_dir):
    """With a threshold the EMA can never reach (>1), auto must reproduce
    the pure-pcg run bit-for-bit and never report a failover."""
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(N, sqp_max_iter=3,
                                 failover_bail_rate=1.5)
    ref = simulate_mpc_scan(iiwa, cfg, *_scan_args(xu, ee), linsys="pcg")
    out = simulate_mpc_scan(iiwa, cfg, *_scan_args(xu, ee), linsys="auto")
    assert not np.asarray(out["failed_over"]).any()
    np.testing.assert_array_equal(np.asarray(out["tracking_path"]),
                                  np.asarray(ref["tracking_path"]))
    np.testing.assert_array_equal(np.asarray(out["tracking_errors"]),
                                  np.asarray(ref["tracking_errors"]))


def test_auto_latches_onto_bcr_pcg(iiwa, fixtures_dir):
    """With an always-tripped threshold (<0) the failover latches after the
    first update; the scanned run must match a hand-rolled loop that solves
    update 0 with pcg and every later update with bcr_pcg."""
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(N, sqp_max_iter=3,
                                 failover_bail_rate=-1.0,
                                 failover_err_threshold_m=-1.0,
                                 failover_check_every=1)
    out = simulate_mpc_scan(iiwa, cfg, *_scan_args(xu, ee), linsys="auto")
    fo = np.asarray(out["failed_over"])
    assert not fo[0] and fo[1:].all(), fo

    # oracle: the same closed loop, backend switched by hand
    from mpcgpu_tpu.sim import _rollout_and_error, _shift_horizon

    do_shift, offsets = make_shift_schedule(cfg, N_UPDATES)
    X = jnp.asarray(xu[:N, :14])
    U = jnp.asarray(xu[: N - 1, 14:])
    lam = jnp.zeros((N, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    goals = jnp.asarray(ee[:N])
    xs = X[0]
    U_prev, first = U, True
    path = []
    for i in range(N_UPDATES):
        res = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, rho, 1e-5,
                        "pcg" if i == 0 else "bcr_pcg")
        X, U, lam, rho = res.X, res.U, res.lam, res.rho
        xs, _ = _rollout_and_error(
            iiwa, cfg, xs, U_prev, goals,
            jnp.asarray(0.0 if first else cfg.simulation_period_us),
            cfg.simulation_period_us,
            int(np.ceil(cfg.simulation_period_us * 1e-6 / cfg.sim_step_time))
            + 1)
        U_prev, first = U, False
        if bool(do_shift[i]):
            X, U, goals, lam = _shift_horizon(
                X, U, goals, lam, jnp.asarray(xu), jnp.asarray(ee),
                offsets[i])
        X = X.at[0].set(xs)
        path.append(np.asarray(xs))
    np.testing.assert_allclose(np.asarray(out["tracking_path"]),
                               np.asarray(path), rtol=1e-5, atol=1e-6)


def test_auto_chunked_latch_switches_at_chunk_boundary(iiwa, fixtures_dir):
    """Chunked latch (SolverConfig.failover_check_every, round 5): with an
    always-tripped threshold and chunk=2, the backend cond is evaluated
    once per 2-update chunk, so the switch lands at update 2 (first chunk
    detects the trip, second chunk runs bcr_pcg).  Must match the
    per-update-latch run except for the one-chunk switch delay -- checked
    against the chunk-boundary oracle (pcg for updates 0-1, bcr_pcg
    after)."""
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(N, sqp_max_iter=3,
                                 failover_bail_rate=-1.0,
                                 failover_err_threshold_m=-1.0,
                                 failover_check_every=2)
    out = simulate_mpc_scan(iiwa, cfg, *_scan_args(xu, ee), linsys="auto")
    fo = np.asarray(out["failed_over"])
    assert not fo[:2].any() and fo[2:].all(), fo

    # oracle: hand-rolled loop, pcg for the first chunk then bcr_pcg
    from mpcgpu_tpu.sim import _rollout_and_error, _shift_horizon

    do_shift, offsets = make_shift_schedule(cfg, N_UPDATES)
    X = jnp.asarray(xu[:N, :14])
    U = jnp.asarray(xu[: N - 1, 14:])
    lam = jnp.zeros((N, 14), jnp.float32)
    rho = jnp.asarray(1e-3, jnp.float32)
    goals = jnp.asarray(ee[:N])
    xs = X[0]
    U_prev, first = U, True
    path = []
    for i in range(N_UPDATES):
        res = sqp_solve(iiwa, cfg, X, U, lam, goals, xs, rho, 1e-5,
                        "pcg" if i < 2 else "bcr_pcg")
        X, U, lam, rho = res.X, res.U, res.lam, res.rho
        xs, _ = _rollout_and_error(
            iiwa, cfg, xs, U_prev, goals,
            jnp.asarray(0.0 if first else cfg.simulation_period_us),
            cfg.simulation_period_us,
            int(np.ceil(cfg.simulation_period_us * 1e-6 / cfg.sim_step_time))
            + 1)
        U_prev, first = U, False
        if bool(do_shift[i]):
            X, U, goals, lam = _shift_horizon(
                X, U, goals, lam, jnp.asarray(xu), jnp.asarray(ee),
                offsets[i])
        X = X.at[0].set(xs)
        path.append(np.asarray(xs))
    np.testing.assert_allclose(np.asarray(out["tracking_path"]),
                               np.asarray(path), rtol=1e-5, atol=1e-6)


def test_auto_chunked_matches_per_update_when_never_tripped(iiwa,
                                                            fixtures_dir):
    """When the latch never trips, the chunked scan (default chunk=8) and
    the per-update scan are the same computation -- bit-identical paths."""
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg1 = SolverConfig.for_knots(N, sqp_max_iter=3,
                                  failover_bail_rate=1.5,
                                  failover_check_every=1)
    cfg8 = dataclasses.replace(cfg1, failover_check_every=8)
    out1 = simulate_mpc_scan(iiwa, cfg1, *_scan_args(xu, ee), linsys="auto")
    out8 = simulate_mpc_scan(iiwa, cfg8, *_scan_args(xu, ee), linsys="auto")
    np.testing.assert_array_equal(np.asarray(out1["tracking_path"]),
                                  np.asarray(out8["tracking_path"]))
    np.testing.assert_array_equal(np.asarray(out1["failed_over"]),
                                  np.asarray(out8["failed_over"]))


def test_auto_host_loop(iiwa, fixtures_dir):
    """Host-loop twin: simulate_mpc(linsys="auto") with an always-tripped
    threshold records the failover and keeps tracking."""
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(N, sqp_max_iter=3,
                                 failover_bail_rate=-1.0,
                                 failover_err_threshold_m=-1.0)
    rec = simulate_mpc(iiwa, cfg, xu, ee, pcg_exit_tol=1e-5,
                       warmup_iters=0, max_timesteps=3,
                       max_control_updates=8, linsys="auto")
    assert rec.failed_over and not rec.failed_over[0]
    assert all(rec.failed_over[1:])
    assert np.isfinite(rec.tracking_errors).all()


def test_auto_error_gate_holds_pcg(iiwa, fixtures_dir):
    """The round-4 error gate: with the bail threshold always tripped but
    the error threshold unreachable (tracking error stays ~0.05 m at this
    scale), auto must NEVER fail over -- bit-identical to pure pcg.  This
    is the behavior that protects healthy pairs (0_0 etc.) from the
    bail-only latch that degraded them in results/round4/tpu_all_pairs.json."""
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(N, sqp_max_iter=3,
                                 failover_bail_rate=-1.0,
                                 failover_err_threshold_m=1e9)
    ref = simulate_mpc_scan(iiwa, cfg, *_scan_args(xu, ee), linsys="pcg")
    out = simulate_mpc_scan(iiwa, cfg, *_scan_args(xu, ee), linsys="auto")
    assert not np.asarray(out["failed_over"]).any()
    np.testing.assert_array_equal(np.asarray(out["tracking_path"]),
                                  np.asarray(ref["tracking_path"]))
