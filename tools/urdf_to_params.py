#!/usr/bin/env python3
"""CLI wrapper: convert a URDF serial-chain robot into an importable
mpcgpu_tpu model-parameter module.

The conversion itself lives in the package (mpcgpu_tpu/models/urdf.py --
``model_from_urdf`` builds a RobotModel at runtime; this tool additionally
emits a frozen params .py in the same format extract_grid_model.py
produces for the IIWA).

Usage:  python tools/urdf_to_params.py robot.urdf out_params.py
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mpcgpu_tpu.models.urdf import build_tables, parse_urdf  # noqa: E402,F401


def emit(params, out_path, src):
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from extract_grid_model import emit as _emit  # same output format

    _emit(params, out_path, src)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("urdf")
    ap.add_argument("out")
    args = ap.parse_args()
    chain, ee = parse_urdf(args.urdf)
    params = build_tables(chain, ee)
    emit(params, args.out, args.urdf)
    print(f"wrote {args.out}: {params['num_joints']} joints")
