"""Schur condensation + PCG vs a dense numpy KKT oracle (SURVEY.md section 7
stage 3/4 oracle strategy: dense assembly of the full KKT matrix and a
numpy Schur complement)."""
import jax
import jax.numpy as jnp
import numpy as np

from mpcgpu_tpu.ops import btridiag
from mpcgpu_tpu.ops.dz import compute_dz
from mpcgpu_tpu.ops.kkt import KKTData
from mpcgpu_tpu.ops.pcg import pcg
from mpcgpu_tpu.ops.schur import form_schur

N, NX, NU = 8, 14, 7
RHO = 1e-3


def random_kkt(seed=0, n=N, nx=NX, nu=NU):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, nx, nx)).astype(np.float32)
    Q = 0.1 * np.einsum("kij,klj->kil", M, M) + np.eye(nx, dtype=np.float32)
    Rm = rng.normal(size=(n - 1, nu, nu)).astype(np.float32)
    R = 0.1 * np.einsum("kij,klj->kil", Rm, Rm) + np.eye(nu, dtype=np.float32)
    A = 0.3 * rng.normal(size=(n - 1, nx, nx)).astype(np.float32)
    B = 0.3 * rng.normal(size=(n - 1, nx, nu)).astype(np.float32)
    q = rng.normal(size=(n, nx)).astype(np.float32)
    r = rng.normal(size=(n - 1, nu)).astype(np.float32)
    c = rng.normal(size=(n, nx)).astype(np.float32)
    c[0] = 0.0  # MPC re-injects x0 = xs, so c0 = 0 at solve entry
    return KKTData(*(jnp.asarray(v) for v in (Q, q, R, r, A, B, c)))


def dense_oracle(kkt, rho):
    """Dense G, C, g, c and the exact Schur system S lam = gamma."""
    n, nx, nu = kkt.Q.shape[0], kkt.Q.shape[-1], kkt.R.shape[-1]
    nz = n * nx + (n - 1) * nu
    G = np.zeros((nz, nz), np.float64)
    g = np.zeros(nz, np.float64)
    off = 0
    offs = []
    for k in range(n):
        offs.append(off)
        G[off:off + nx, off:off + nx] = np.asarray(kkt.Q[k]) + rho * np.eye(nx)
        g[off:off + nx] = np.asarray(kkt.q[k])
        off += nx
        if k < n - 1:
            G[off:off + nu, off:off + nu] = np.asarray(kkt.R[k]) + rho * np.eye(nu)
            g[off:off + nu] = np.asarray(kkt.r[k])
            off += nu
    C = np.zeros((n * nx, nz), np.float64)
    cvec = np.asarray(kkt.c, np.float64).reshape(-1)
    C[0:nx, 0:nx] = np.eye(nx)
    for k in range(1, n):
        C[k * nx:(k + 1) * nx, offs[k]:offs[k] + nx] = np.eye(nx)
        C[k * nx:(k + 1) * nx, offs[k - 1]:offs[k - 1] + nx] = -np.asarray(kkt.A[k - 1])
        C[k * nx:(k + 1) * nx, offs[k - 1] + nx:offs[k]] = -np.asarray(kkt.B[k - 1])
    Ginv = np.linalg.inv(G)
    S = C @ Ginv @ C.T
    gamma = C @ Ginv @ g - cvec
    return G, C, g, cvec, S, gamma


def test_spmv_matches_dense():
    rng = np.random.default_rng(1)
    dense = rng.normal(size=(N * NX, N * NX)).astype(np.float32)
    T = btridiag.from_dense(jnp.asarray(dense), N, NX)
    x = rng.normal(size=(N, NX)).astype(np.float32)
    y = btridiag.spmv(T, jnp.asarray(x))
    y_ref = (np.asarray(btridiag.to_dense(T)) @ x.reshape(-1)).reshape(N, NX)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


def test_schur_matches_dense_oracle():
    kkt = random_kkt()
    sd = form_schur(kkt, RHO)
    _, _, _, _, S_ref, gamma_ref = dense_oracle(kkt, RHO)
    S = np.asarray(btridiag.to_dense(sd.S), np.float64)
    np.testing.assert_allclose(S, S_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(sd.gamma).reshape(-1), gamma_ref, rtol=2e-3, atol=2e-3
    )
    # stair preconditioner: diagonal blocks are exact theta inverses
    Pd = np.asarray(sd.Pinv.diag, np.float64)
    for k in range(N):
        blk = S_ref[k * NX:(k + 1) * NX, k * NX:(k + 1) * NX]
        np.testing.assert_allclose(Pd[k] @ blk, np.eye(NX), atol=5e-3)


def test_pcg_solves_schur_system():
    kkt = random_kkt(seed=2)
    sd = form_schur(kkt, RHO)
    lam0 = jnp.zeros((N, NX), jnp.float32)
    res = pcg(sd.S, sd.Pinv, sd.gamma, lam0, max_iter=500, exit_tol=1e-10)
    S = np.asarray(btridiag.to_dense(sd.S), np.float64)
    lam_ref = np.linalg.solve(S, np.asarray(sd.gamma, np.float64).reshape(-1))
    np.testing.assert_allclose(
        np.asarray(res.lam).reshape(-1), lam_ref, rtol=5e-3, atol=5e-3
    )
    assert not bool(res.hit_max)


def test_stair_preconditioner_accelerates():
    kkt = random_kkt(seed=3)
    sd = form_schur(kkt, RHO, preconditioned=True)
    sd_np = form_schur(kkt, RHO, preconditioned=False)
    lam0 = jnp.zeros((N, NX), jnp.float32)
    # tolerance semantics differ (eta = r'Pinv r vs r'r) -- compare via
    # achieved residual at equal iteration counts instead.
    it_pc = int(pcg(sd.S, sd.Pinv, sd.gamma, lam0, 500, 1e-10).iters)
    it_np = int(pcg(sd_np.S, sd_np.Pinv, sd_np.gamma, lam0, 500, 1e-10).iters)
    assert it_pc < it_np, (it_pc, it_np)


def test_dz_matches_dense_kkt_solution():
    kkt = random_kkt(seed=4)
    sd = form_schur(kkt, RHO)
    G, C, g, cvec, S_ref, gamma_ref = dense_oracle(kkt, RHO)
    # the full saddle-point KKT oracle: [[G, C'], [C, 0]] [dz; mult] = [-g; -c]
    nz, m = G.shape[0], C.shape[0]
    kkt_mat = np.block([[G, C.T], [C, np.zeros((m, m))]])
    sol = np.linalg.solve(kkt_mat, np.concatenate([-g, -cvec]))
    dz_ref, mult = sol[:nz], sol[nz:]
    # the Schur dual with gamma = C G^{-1} g - c is the negated multiplier
    lam = np.linalg.solve(S_ref, gamma_ref)
    np.testing.assert_allclose(lam, -mult, rtol=1e-6, atol=1e-6)

    lam_j = jnp.asarray(lam.reshape(N, NX), jnp.float32)
    dX, dU = compute_dz(kkt, sd, lam_j)
    dz_got = []
    for k in range(N):
        dz_got.append(np.asarray(dX[k]))
        if k < N - 1:
            dz_got.append(np.asarray(dU[k]))
    dz_got = np.concatenate(dz_got)
    np.testing.assert_allclose(dz_got, dz_ref, rtol=3e-3, atol=3e-3)
    # and the full KKT system is satisfied: C dz = -c
    np.testing.assert_allclose(C @ dz_ref, -cvec, atol=1e-8)
