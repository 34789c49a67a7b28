"""Host-side sparse LDL' oracle backend (the reference's QDLDL path).

Rebuilds the reference's CPU linear-system oracle
(reference include/qdldl/sqp.cuh:23-48 ``qdldl_solve_schur``: device->host
copy of the CSR values + gamma, host LDL' factor+solve, host->device copy
of lambda) the TPU way: the jitted SQP loop calls out through
``jax.pure_callback``, and the factorization runs in a small C++ library
(native/ldl.cpp) compiled on first use, with a scipy fallback.

The sparsity is the fixed upper triangle of the block-tridiagonal Schur
complement: nnz = N*s*(s+1)/2 + (N-1)*s^2 (reference include/utils/csr.cuh
and qdldl/sqp.cuh:148).
"""
from __future__ import annotations

import ctypes
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


@lru_cache(maxsize=1)
def _load_native():
    """Compile (once) and load native/ldl.cpp; None if no toolchain."""
    so = _NATIVE_DIR / "libldl.so"
    src = _NATIVE_DIR / "ldl.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.CalledProcessError):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ldl_etree.restype = ctypes.c_int
    lib.ldl_etree.argtypes = [ctypes.c_int, i32p, i32p, i32p, i32p, i32p]
    lib.ldl_factor.restype = ctypes.c_int
    lib.ldl_factor.argtypes = [
        ctypes.c_int, i32p, i32p, f32p, i32p, i32p, f32p, f32p, f32p,
        i32p, i32p, u8p, i32p, f32p,
    ]
    lib.ldl_solve.restype = None
    lib.ldl_solve.argtypes = [ctypes.c_int, i32p, i32p, f32p, f32p, i32p, f32p]
    return lib


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _bptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _btd_upper_csc(lower, diag, upper):
    """Upper-triangular CSC (Ap, Ai, Ax) of a block-tridiagonal matrix.

    Column j of the global matrix holds: the upper-block entries from block
    row k-1 (all s rows) when j is in block k>0, then the diagonal-block
    entries with row <= j.  Rows ascend naturally in this order.
    """
    n, s, _ = diag.shape
    dim = n * s
    cols_ai, cols_ax, ap = [], [], [0]
    for k in range(n):
        for cj in range(s):
            rows, vals = [], []
            if k > 0:
                rows.append(np.arange((k - 1) * s, k * s, dtype=np.int32))
                vals.append(upper[k - 1][:, cj])
            rows.append(np.arange(k * s, k * s + cj + 1, dtype=np.int32))
            vals.append(diag[k][: cj + 1, cj])
            cols_ai.append(np.concatenate(rows))
            cols_ax.append(np.concatenate(vals))
            ap.append(ap[-1] + cols_ai[-1].size)
    return (
        np.asarray(ap, np.int32),
        np.concatenate(cols_ai).astype(np.int32),
        np.concatenate(cols_ax).astype(np.float32),
    )


class LDLSolver:
    """Factor/solve S x = b for the block-tridiagonal Schur complement.

    Symbolic analysis (etree + counts) runs once per sparsity pattern,
    exactly like the reference's one-time QDLDL_etree (qdldl/sqp.cuh:193).
    """

    def __init__(self, n_blocks: int, block_size: int):
        self.n, self.s = n_blocks, block_size
        self.dim = n_blocks * block_size
        self.lib = _load_native()
        self._sym = None

    def _symbolic(self, Ap, Ai):
        dim = self.dim
        work = np.zeros(dim, np.int32)
        Lnz = np.zeros(dim, np.int32)
        etree = np.zeros(dim, np.int32)
        total = self.lib.ldl_etree(dim, _iptr(Ap), _iptr(Ai), _iptr(work),
                                   _iptr(Lnz), _iptr(etree))
        assert total >= 0, "matrix missing diagonal entry"
        Lp = np.zeros(dim + 1, np.int32)
        np.cumsum(Lnz, out=Lp[1:])
        self._sym = (Lnz, etree, Lp, total)

    def solve(self, lower, diag, upper, b):
        Ap, Ai, Ax = _btd_upper_csc(
            np.asarray(lower), np.asarray(diag), np.asarray(upper)
        )
        return self.solve_csc(Ap, Ai, Ax, b)

    def solve_csc(self, Ap, Ai, Ax, b):
        """Numeric factor + solve on a pre-assembled upper CSC pattern.

        This is the part the reference's TIME_LINSYS brackets (the CSR
        values are written on-GPU there, qdldl/sqp.cuh:44-48) -- exposed
        separately so timing comparisons exclude the host assembly."""
        x = np.asarray(b, np.float32).reshape(-1).copy()
        if self.lib is None:  # scipy fallback
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            A = sp.csc_matrix((Ax, Ai, Ap), shape=(self.dim, self.dim))
            A = A + sp.triu(A, 1).T
            return spla.spsolve(A.tocsc(), x).astype(np.float32).reshape(
                np.shape(b)
            )

        if self._sym is None:
            self._symbolic(Ap, Ai)
        Lnz, etree, Lp, total = self._sym
        dim = self.dim
        Li = np.zeros(max(total, 1), np.int32)
        Lx = np.zeros(max(total, 1), np.float32)
        D = np.zeros(dim, np.float32)
        Dinv = np.zeros(dim, np.float32)
        bwork = np.zeros(dim, np.uint8)
        iwork = np.zeros(3 * dim, np.int32)
        fwork = np.zeros(dim, np.float32)
        ok = self.lib.ldl_factor(
            dim, _iptr(Ap), _iptr(Ai), _fptr(Ax), _iptr(Lp), _iptr(Li),
            _fptr(Lx), _fptr(D), _fptr(Dinv), _iptr(Lnz), _iptr(etree),
            _bptr(bwork), _iptr(iwork), _fptr(fwork),
        )
        if ok < dim:  # indefinite/singular: surface NaNs like a failed solve
            return np.full(np.shape(b), np.nan, np.float32)
        self.lib.ldl_solve(dim, _iptr(Lp), _iptr(Li), _fptr(Lx), _fptr(Dinv),
                           _iptr(iwork), _fptr(x))
        return x.reshape(np.shape(b))


@lru_cache(maxsize=8)
def _cached_solver(n_blocks: int, block_size: int) -> LDLSolver:
    return LDLSolver(n_blocks, block_size)


def register_backend():
    """Register the 'qdldl' linsys backend on the SQP solver."""
    import jax
    import jax.numpy as jnp

    from mpcgpu_tpu.sqp import register_linsys_backend

    def solve(cfg, schur, lam, pcg_exit_tol):
        n, s = schur.gamma.shape

        def host_solve(lower, diag, upper, gamma):
            return _cached_solver(n, s).solve(lower, diag, upper, gamma)

        lam_new = jax.pure_callback(
            host_solve,
            jax.ShapeDtypeStruct((n, s), schur.gamma.dtype),
            schur.S.lower, schur.S.diag, schur.S.upper, schur.gamma,
        )
        return lam_new, jnp.int32(0), jnp.bool_(False)

    register_linsys_backend("qdldl", solve)


register_backend()
