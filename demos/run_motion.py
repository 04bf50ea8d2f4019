#!/usr/bin/env python
"""End-to-end motion demo (thin shim over centroidal_mpc_tpu.cli).

The script form of the reference demo notebooks
(build/lib/demos/run_motion.py, demos/trot_demo.ipynb): pick a preset, run
the full pipeline, drop npz artifacts, analysis figures, and an HTML 3D
motion preview in --out.

Usage:
    python demos/run_motion.py --preset solo12_trot --sims 32 --out artifacts/trot
    python demos/run_motion.py --preset solo12_bound --cpu --f64

Installed form (pip install -e .):  cmpc-run-motion --preset solo12_trot
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from centroidal_mpc_tpu.cli import run_motion_main

if __name__ == "__main__":
    run_motion_main()
