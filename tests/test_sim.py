"""Closed-loop MPC integration test: track a slice of fixture 0_0 and stay
near the recorded end-effector path (the reference's integration-test
strategy, SURVEY.md section 4)."""
import numpy as np
import pytest

from mpcgpu_tpu.config import SolverConfig
from mpcgpu_tpu.sim import simulate_mpc
from mpcgpu_tpu.utils.trajfiles import load_fixture_pair


@pytest.mark.slow
def test_mpc_tracks_fixture_slice(iiwa, fixtures_dir):
    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(16, sqp_max_iter=5)
    rec = simulate_mpc(
        iiwa, cfg, xu, ee,
        pcg_exit_tol=1e-5,
        warmup_iters=2,
        max_timesteps=40,          # ~0.6 s of the figure-eight
        max_control_updates=400,
    )
    s = rec.summary()
    assert rec.timesteps == 40
    assert len(rec.tracking_errors) == 40
    # tracking error in meters (L1 over xyz); the arm starts on the path.
    # The reference cost design (torque weight vs tracking weight, rank-1
    # position Hessian) equilibrates at a 0.1-0.3 m lag -- the same envelope
    # the MPCGPU paper reports; assert we stay inside it.
    assert s["avg_tracking_error"] < 0.15, s
    assert s["final_tracking_error"] < 0.4, s
    # solver self-diagnostics: PCG should rarely hit its iteration cap
    # (the reference warns above 50%, mpcsim.cuh:436-441)
    assert s["pcg_max_exit_rate"] < 0.5, s


@pytest.mark.slow
def test_gauss_newton_hessian_improves_tracking(iiwa, fixtures_dir):
    """Extension: the true Gauss-Newton Hessian (cost.hessian="gauss_newton")
    keeps curvature in the task directions and must track at least as well
    as the reference's rank-1 Hessian on the same slice."""
    import dataclasses

    from mpcgpu_tpu.config import CostConfig

    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    base = SolverConfig.for_knots(16, sqp_max_iter=5)
    gn = dataclasses.replace(
        base, cost=dataclasses.replace(base.cost, hessian="gauss_newton")
    )
    kw = dict(pcg_exit_tol=1e-5, warmup_iters=2, max_timesteps=25,
              max_control_updates=250)
    rec_ref = simulate_mpc(iiwa, base, xu, ee, **kw)
    rec_gn = simulate_mpc(iiwa, gn, xu, ee, **kw)
    a_ref = rec_ref.summary()["avg_tracking_error"]
    a_gn = rec_gn.summary()["avg_tracking_error"]
    assert a_gn < a_ref * 1.2, (a_gn, a_ref)


@pytest.mark.slow
def test_scan_loop_matches_host_loop(iiwa, fixtures_dir):
    """The device-resident scanned loop must reproduce the host loop's
    closed-loop behavior (same shift schedule, same tracking errors)."""
    import jax.numpy as jnp
    import numpy as np

    from mpcgpu_tpu.sim import simulate_mpc_scan

    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(16, sqp_max_iter=3)
    n_updates = 50

    rec = simulate_mpc(
        iiwa, cfg, xu, ee, pcg_exit_tol=1e-5, warmup_iters=0,
        max_control_updates=n_updates, max_timesteps=10**6,
    )
    out = simulate_mpc_scan(
        iiwa, cfg, jnp.asarray(xu), jnp.asarray(ee),
        jnp.asarray(xu[:16, :14]), jnp.asarray(xu[:15, 14:]),
        jnp.zeros((16, 14), jnp.float32), jnp.asarray(1e-3, jnp.float32),
        1e-5, n_updates,
    )
    errs_scan = np.asarray(out["tracking_errors"])[np.asarray(out["shifted"])]
    errs_host = np.asarray(rec.tracking_errors)
    assert errs_scan.shape == errs_host.shape
    np.testing.assert_allclose(errs_scan, errs_host, rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_scan_loop_matches_host_loop_pallas_stages(iiwa, fixtures_dir):
    """Fused-stage (Pallas, interpreter-mode on CPU) variant of the
    scan-vs-host equivalence: the production kernel path must follow the
    same closed-loop schedule and errors as its host-loop twin."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from mpcgpu_tpu.sim import simulate_mpc_scan

    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = dataclasses.replace(
        SolverConfig.for_knots(16, sqp_max_iter=2), pallas_stages=True
    )
    n_updates = 16

    rec = simulate_mpc(
        iiwa, cfg, xu, ee, pcg_exit_tol=1e-5, warmup_iters=0,
        max_control_updates=n_updates, max_timesteps=10**6,
    )
    out = simulate_mpc_scan(
        iiwa, cfg, jnp.asarray(xu), jnp.asarray(ee),
        jnp.asarray(xu[:16, :14]), jnp.asarray(xu[:15, 14:]),
        jnp.zeros((16, 14), jnp.float32), jnp.asarray(1e-3, jnp.float32),
        1e-5, n_updates,
    )
    errs_scan = np.asarray(out["tracking_errors"])[np.asarray(out["shifted"])]
    errs_host = np.asarray(rec.tracking_errors)
    assert errs_scan.shape == errs_host.shape
    np.testing.assert_allclose(errs_scan, errs_host, rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_packed_scan_loop_matches_single_arm_scan_loops(iiwa, fixtures_dir):
    """simulate_mpc_scan_packed (B arms in one lane batch, arm-packed
    whole-solve megakernel) must reproduce B independent single-arm
    megasolve closed loops started from the same perturbed states --
    this covers the sim-level pack/unpack, per-arm rollout, and shared
    shift-schedule plumbing (the kernel-level equivalence is
    tests/test_megakernel.py::test_packed_arms_match_single_arm_solves).
    Cap-bound CG (tol ~ 0) so lockstep iteration counts match the
    single-arm runs."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpcgpu_tpu.sim import simulate_mpc_scan, simulate_mpc_scan_packed

    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    n, b_arms, n_updates = 4, 2, 2
    cfg = dataclasses.replace(
        SolverConfig.for_knots(n, sqp_max_iter=2),
        pallas_stages=True, megakernel=True, megakernel_solve=True)
    cfg = dataclasses.replace(
        cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=4))
    f32 = jnp.float32
    X = jnp.asarray(xu[:n, :14], f32)
    U = jnp.asarray(xu[: n - 1, 14:], f32)
    lam = jnp.zeros((n, 14), f32)
    rho = jnp.asarray(1e-3, f32)
    tol = 1e-9

    packed = simulate_mpc_scan_packed(
        iiwa, cfg, jnp.asarray(xu), jnp.asarray(ee), X, U, lam, rho, tol,
        n_updates, batch=b_arms, seed=0)

    # same per-arm start perturbation as simulate_mpc_scan_packed(seed=0)
    dq = 0.02 * jax.random.normal(jax.random.PRNGKey(0), (b_arms, cfg.nq), f32)
    for a in range(b_arms):
        Xa = X.at[0, : cfg.nq].add(dq[a])
        single = simulate_mpc_scan(
            iiwa, cfg, jnp.asarray(xu), jnp.asarray(ee), Xa, U, lam, rho,
            tol, n_updates)
        np.testing.assert_allclose(
            np.asarray(packed["tracking_errors"][a]),
            np.asarray(single["tracking_errors"]), rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(packed["final_xs"][a]),
            np.asarray(single["final_xs"]), rtol=2e-2, atol=2e-3)
        np.testing.assert_array_equal(
            np.asarray(packed["sqp_iters"][a]),
            np.asarray(single["sqp_iters"]))


def test_shift_horizon_padded_traj_len_matches_unpadded(fixtures_dir):
    """The traced traj_len path (one static shape for all fixtures --
    the all-pairs timing fix) must reproduce the unpadded shift exactly,
    including at the within-trajectory/goal-hold boundary."""
    import jax.numpy as jnp
    import numpy as np

    from mpcgpu_tpu.sim import _shift_horizon

    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    xu, ee = xu[:130], ee[:130]  # a short trajectory, like pairs 3_4 etc.
    n = 16
    true_len = xu.shape[0]
    pad_len = true_len + 37

    def pad(a):
        reps = np.repeat(a[-1:], pad_len - a.shape[0], axis=0)
        return np.concatenate([a, reps], axis=0)

    X = jnp.asarray(xu[:n, :14]); U = jnp.asarray(xu[:n - 1, 14:])
    goals = jnp.asarray(ee[:n])
    lam = jnp.asarray(np.random.default_rng(0).normal(size=(n, 14)),
                      jnp.float32)
    xu_j, ee_j = jnp.asarray(xu), jnp.asarray(ee)
    xu_p, ee_p = jnp.asarray(pad(xu)), jnp.asarray(pad(ee))
    tlen = jnp.asarray(true_len, jnp.int32)

    # offsets spanning deep-inside, the boundary flip, and past the end
    for off in (1, true_len - n - 1, true_len - n, true_len - n + 1,
                true_len - 2, true_len + 5):
        ref = _shift_horizon(X, U, goals, lam, xu_j, ee_j,
                             jnp.asarray(off, jnp.int32))
        got = _shift_horizon(X, U, goals, lam, xu_p, ee_p,
                             jnp.asarray(off, jnp.int32), tlen)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_mpc_tracks_second_fixture(iiwa, fixtures_dir):
    """A different recorded (start, goal) pair through the same loop."""
    xu, ee = load_fixture_pair(fixtures_dir, 0, 1, model=iiwa)
    cfg = SolverConfig.for_knots(16, sqp_max_iter=5)
    rec = simulate_mpc(
        iiwa, cfg, xu, ee, pcg_exit_tol=1e-5, warmup_iters=2,
        max_timesteps=20, max_control_updates=200,
    )
    s = rec.summary()
    assert rec.timesteps == 20
    assert s["avg_tracking_error"] < 0.3, s


def test_dual_residual_recording(iiwa, fixtures_dir):
    """record_dual_residual=True populates MPCRecord.dual_residuals with
    finite backward errors, and an exact solve (dense) scores a smaller
    median than a hard-truncated PCG on the same run (the cap-exit
    honesty metric, sim._dual_residual)."""
    import dataclasses

    xu, ee = load_fixture_pair(fixtures_dir, 0, 0)
    cfg = SolverConfig.for_knots(8, sqp_max_iter=2)
    kw = dict(pcg_exit_tol=1e-5, warmup_iters=1, max_timesteps=4,
              max_control_updates=64, record_dual_residual=True)
    trunc = dataclasses.replace(
        cfg, pcg=dataclasses.replace(cfg.pcg, max_iter=2))
    rec_t = simulate_mpc(iiwa, trunc, xu, ee, linsys="pcg", **kw)
    rec_d = simulate_mpc(iiwa, cfg, xu, ee, linsys="dense", **kw)
    for rec in (rec_t, rec_d):
        assert len(rec.dual_residuals) == len(rec.sqp_times_us)
        dr = np.asarray(rec.dual_residuals)
        assert np.isfinite(dr).all() and (dr >= 0).all()
        assert {"dual_residual_p50", "dual_residual_p90",
                "dual_residual_max"} <= rec.summary().keys()
    assert (np.median(rec_d.dual_residuals)
            < np.median(rec_t.dual_residuals)), (
        rec_d.summary(), rec_t.summary())
