#!/usr/bin/env python3
"""Long-horizon scaling study (BASELINE config 5).

Sweeps the horizon N up to 512 knots on a single chip (reference
experiments sweep 2..512, experiments/01_*.py:8) and, when multiple
devices are available, runs the horizon-sharded PCG with explicit ICI
collectives to measure the multi-chip path.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--knots", type=int, nargs="*",
                    default=[64, 128, 256, 512])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpcgpu_tpu.config import PCGConfig
    from mpcgpu_tpu.ops.pcg import pcg
    from mpcgpu_tpu.ops.pallas.pcg_kernel import pcg_pallas
    from mpcgpu_tpu.ops.schur import form_schur
    from mpcgpu_tpu.ops.kkt import KKTData

    rng = np.random.default_rng(0)

    def random_kkt(n, nx=14, nu=7):
        M = rng.normal(size=(n, nx, nx)).astype(np.float32)
        Q = 0.1 * np.einsum("kij,klj->kil", M, M) + np.eye(nx, dtype=np.float32)
        Rm = rng.normal(size=(n - 1, nu, nu)).astype(np.float32)
        R = 0.1 * np.einsum("kij,klj->kil", Rm, Rm) + np.eye(nu, dtype=np.float32)
        return KKTData(
            Q=jnp.asarray(Q), q=jnp.asarray(rng.normal(size=(n, nx)), jnp.float32),
            R=jnp.asarray(R), r=jnp.asarray(rng.normal(size=(n - 1, nu)), jnp.float32),
            A=jnp.asarray(0.3 * rng.normal(size=(n - 1, nx, nx)), jnp.float32),
            B=jnp.asarray(0.3 * rng.normal(size=(n - 1, nx, nu)), jnp.float32),
            c=jnp.asarray(rng.normal(size=(n, nx)), jnp.float32),
        )

    print(f"devices: {jax.devices()}")
    for n in args.knots:
        kkt = random_kkt(n)
        sd = form_schur(kkt, 1e-3)
        lam0 = jnp.zeros((n, 14), jnp.float32)
        cap = PCGConfig.tuned_max_iter(n)

        f = jax.jit(lambda l: pcg_pallas(sd.S, sd.Pinv, sd.gamma, l, cap, 1e-8))
        out = f(lam0); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(lam0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20 * 1e6
        print(f"N={n}: fused PCG solve {dt:.0f} us "
              f"({int(out[1])} iters, cap {cap})")

        if len(jax.devices()) > 1 and n % len(jax.devices()) == 0:
            from mpcgpu_tpu.parallel.pcg_sharded import pcg_sharded
            from mpcgpu_tpu.parallel.sharded import horizon_mesh

            mesh = horizon_mesh()
            g = jax.jit(lambda l: pcg_sharded(mesh, sd.S, sd.Pinv, sd.gamma,
                                              l, cap, 1e-8))
            out = g(lam0); jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(20):
                out = g(lam0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 20 * 1e6
            print(f"N={n}: sharded PCG over {len(jax.devices())} devices "
                  f"{dt:.0f} us ({int(out[1])} iters)")


if __name__ == "__main__":
    main()
