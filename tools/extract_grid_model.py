#!/usr/bin/env python3
"""Mechanically extract robot-model *data* from a GRiD-generated dynamics header.

GRiD (github.com/robot-acceleration/GRiD) emits machine-generated CUDA with the
robot's physical parameters baked in as numeric literals:

  * ``init_XImats()``               -- 728 constants: 7 spatial joint transforms
    X[i] (6x6, column-major), 7 spatial inertias I[i] (6x6), 7 homogeneous frame
    transforms Xhom[i] (4x4) and their angle-derivatives dXhom[i]
    (reference: /root/reference/include/dynamics/iiwa/iiwa_eepos_grid.cuh:909-1671).
  * ``load_update_XImats_helpers`` / ``load_update_XmatsHom_helpers`` -- per-q
    updates of those matrices; every updated entry is an *affine function of
    sin(q_i), cos(q_i)* (reference lines 1770-2000).

This script parses both and solves for the affine decomposition

    X_i(q_i)     =  Xc[i] + sin(q_i) * Xs[i] + cos(q_i) * Xk[i]

(and likewise for Xhom / dXhom), which is exact because each generated update
assignment is linear in (sin, cos) with constant coefficients.  The result is a
plain-Python parameter module: pure *data* (the robot's kinematic/inertial
description, equivalent to its URDF), not translated code.

Usage:
    python tools/extract_grid_model.py \
        /root/reference/include/dynamics/iiwa/iiwa_eepos_grid.cuh \
        mpcgpu_tpu/models/iiwa14_params.py
"""
from __future__ import annotations

import re
import sys

import numpy as np

NJ = 7  # joints in the IIWA model; the parser asserts this from the file.


def _parse_init_constants(text: str) -> np.ndarray:
    """Parse the 728 `h_XImats[i] = static_cast<T>(v);` literals."""
    body = text.split("T* init_XImats() {", 1)[1].split("return d_XImats;", 1)[0]
    vals = {}
    for m in re.finditer(r"h_XImats\[(\d+)\]\s*=\s*static_cast<T>\(([-0-9.eE]+)\)", body):
        vals[int(m.group(1))] = float(m.group(2))
    n = max(vals) + 1
    assert n == 728, f"expected 728 constants, got {n}"
    out = np.zeros(n)
    for i, v in vals.items():
        out[i] = v
    return out


def _parse_updates(text: str, fn_sig: str, arr_name: str, end_marker: str):
    """Parse `s_ARR[idx] = static_cast<T>(expr);` updates inside a function.

    Returns a list of (index, expr_string) where expr uses s_temp[k]
    (k<7 -> sin(q_k), k>=7 -> cos(q_{k-7})).
    """
    body = text.split(fn_sig, 1)[1].split(end_marker, 1)[0]
    updates = []
    for m in re.finditer(
        rf"{arr_name}\[(\d+)\]\s*=\s*static_cast<T>\((.+?)\);", body
    ):
        expr = m.group(2)
        if "d_robotModel" in expr:  # the plain load loop, not an update
            continue
        updates.append((int(m.group(1)), expr))
    return updates


def _affine_decompose(base: np.ndarray, updates, size: int):
    """Solve entry(q) = C + sin(q_j)*S + cos(q_j)*K exactly.

    Every update expression is evaluated at probe values of s_temp; linearity
    in the 14 probe slots is asserted with a quadratic check.
    """

    def apply(stemp: np.ndarray) -> np.ndarray:
        arr = base[:size].copy()
        env = {"s_temp": stemp}
        for idx, expr in updates:
            arr[idx] = eval(expr, {"__builtins__": {}}, env)  # noqa: S307 - numeric literals only
        return arr

    zero = np.zeros(2 * NJ)
    const = apply(zero)
    coef = np.zeros((2 * NJ, size))
    for k in range(2 * NJ):
        e = zero.copy()
        e[k] = 1.0
        coef[k] = apply(e) - const
        # linearity probe: f(2e) - f(0) must equal 2*(f(e) - f(0))
        e2 = zero.copy()
        e2[k] = 2.0
        assert np.allclose(apply(e2) - const, 2 * coef[k]), "nonlinear update!"
    # cross-term probe on a random direction
    rng = np.random.default_rng(0)
    d = rng.normal(size=2 * NJ)
    assert np.allclose(apply(d), const + coef.T @ d, atol=1e-12), "cross terms!"
    sin_c = coef[:NJ]  # sin(q_k) coefficients, shape (NJ, size)
    cos_c = coef[NJ:]
    # each 'size/NJ'-sized block depends only on its own joint's angle
    blk = size // NJ
    for k in range(NJ):
        mask = np.ones(size, bool)
        mask[k * blk:(k + 1) * blk] = False
        assert not sin_c[k, mask].any() and not cos_c[k, mask].any(), (
            f"joint {k} influences a foreign block")
    return const, sin_c.sum(axis=0), cos_c.sum(axis=0)


def _colmajor_blocks(flat: np.ndarray, nblk: int, dim: int) -> np.ndarray:
    """(nblk*dim*dim,) column-major blocks -> (nblk, dim, dim) row-major math."""
    return flat.reshape(nblk, dim, dim).transpose(0, 2, 1)


def extract(path: str):
    text = open(path).read()
    nj = int(re.search(r"const int NUM_JOINTS = (\d+);", text).group(1))
    assert nj == NJ
    base = _parse_init_constants(text)

    # --- spatial X (first 252 floats) + the "copy rot into lower-right" rule
    x_updates = _parse_updates(
        text,
        "void load_update_XImats_helpers(",
        r"s_XImats",
        "load_update_XmatsHom_helpers",
    )
    xc_f, xs_f, xk_f = _affine_decompose(base, x_updates, 252)

    def finish_X(flat: np.ndarray) -> np.ndarray:
        X = _colmajor_blocks(flat, NJ, 6)
        # generated copy loop (ref :1839-1843): lower-right 3x3 := upper-left 3x3
        X[:, 3:6, 3:6] = X[:, 0:3, 0:3]
        return X

    Xc, Xs, Xk = finish_X(xc_f), finish_X(xs_f), finish_X(xk_f)

    # --- spatial inertias I[i]: constants only, floats 252..504
    I6 = _colmajor_blocks(base[252:504], NJ, 6)

    # --- homogeneous transforms: base floats 504..616, updates in the
    # two-arg load_update_XmatsHom_helpers; dXhom base 616..728.
    hom_updates = _parse_updates(
        text,
        "void load_update_XmatsHom_helpers(T *s_XmatsHom, T *s_dXmatsHom,",
        r"s_XmatsHom",
        "end_effector_positions_inner",
    )
    dhom_updates = _parse_updates(
        text,
        "void load_update_XmatsHom_helpers(T *s_XmatsHom, T *s_dXmatsHom,",
        r"s_dXmatsHom",
        "end_effector_positions_inner",
    )
    hc_f, hs_f, hk_f = _affine_decompose(base[504:616], hom_updates, 112)
    dc_f, ds_f, dk_f = _affine_decompose(base[616:728], dhom_updates, 112)

    def hom(flat: np.ndarray) -> np.ndarray:
        return flat.reshape(NJ, 4, 4).transpose(0, 2, 1)

    return dict(
        num_joints=NJ,
        Xc=Xc, Xs=Xs, Xk=Xk,
        I=I6,
        Hc=hom(hc_f), Hs=hom(hs_f), Hk=hom(hk_f),
        dHc=hom(dc_f), dHs=hom(ds_f), dHk=hom(dk_f),
    )


def emit(params: dict, out_path: str, src_path: str):
    def fmt(a: np.ndarray) -> str:
        return np.array2string(
            a, separator=", ", threshold=10**9, precision=17, floatmode="maxprec"
        )

    with open(out_path, "w") as f:
        f.write(
            '"""IIWA-14 robot parameters (7-DOF Kuka arm), auto-extracted data.\n\n'
            "Generated by tools/extract_grid_model.py from the GRiD-generated model\n"
            f"header ({src_path}; constants at :909-1671, affine sin/cos update\n"
            "rules at :1770-2000).  These are the robot's physical parameters --\n"
            "kinematic frame transforms and spatial inertias, the same data a URDF\n"
            "carries -- expressed as the exact affine decomposition\n"
            "    X_i(q_i) = Xc[i] + sin(q_i)*Xs[i] + cos(q_i)*Xk[i].\n"
            "All joints are revolute about the local z axis (motion subspace\n"
            "S = [0,0,1,0,0,0]); the kinematic tree is a serial chain.\n"
            '"""\n\nimport numpy as np\n\n'
        )
        f.write(f"NUM_JOINTS = {params['num_joints']}\n\n")
        for name in ["Xc", "Xs", "Xk", "I", "Hc", "Hs", "Hk", "dHc", "dHs", "dHk"]:
            f.write(f"{name} = np.array({fmt(params[name])})\n\n")


if __name__ == "__main__":
    src = sys.argv[1]
    dst = sys.argv[2]
    p = extract(src)
    emit(p, dst, src)
    print(f"wrote {dst}")
    for k, v in p.items():
        if isinstance(v, np.ndarray):
            print(f"  {k}: shape {v.shape}")
