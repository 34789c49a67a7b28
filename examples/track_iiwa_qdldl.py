#!/usr/bin/env python3
"""IIWA tracking with the host LDL' oracle backend.

Rebuild of reference examples/track_iiwa_qdldl.cu:14-156: the same MPC
harness as track_iiwa_pcg.py but with the exact host-side LDL'
factorization in place of PCG (single tolerance slot, like the
reference's -1).  Thin wrapper over the shared driver.
"""
import sys

from track_iiwa_pcg import main

if __name__ == "__main__":
    sys.argv += ["--linsys", "qdldl", "--tols", "-1"]
    main()
