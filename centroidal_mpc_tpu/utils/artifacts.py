"""Artifact store: the npz stage-handoff protocol, made explicit.

The reference pipeline communicates between stages through npz files in the
CWD with hardcoded names (SURVEY.md section 5 "checkpoint/resume"):
  wholeBody_to_centroidal_traj.npz   (X)      DDP warm start -> SCP
  centroidal_to_wholeBody_traj.npz   (X, U)   SCP -> DDP tracking
  scp_sol_interpol_{nom,stoch}.npz   (X, U)   interpolated SCP solution
  wholeBody_interpolated_traj.npz    (X, U, q, qdot, gains)
Each stage is independently re-runnable from these files.  Here the same
protocol lives behind a directory-scoped store with the same keys, so
runs are resumable and artifacts are inspectable, without CWD pollution.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

# Canonical stage-handoff artifact names (reference file names, minus .npz).
WHOLEBODY_TO_CENTROIDAL = "wholeBody_to_centroidal_traj"
CENTROIDAL_TO_WHOLEBODY = "centroidal_to_wholeBody_traj"
SCP_INTERPOLATED_NOMINAL = "scp_sol_interpol_nom"
SCP_INTERPOLATED_STOCHASTIC = "scp_sol_interpol_stoch"
WHOLEBODY_INTERPOLATED = "wholeBody_interpolated_traj"


class ArtifactStore:
    """Directory-backed npz artifact store."""

    def __init__(self, root: os.PathLike | str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, name: str) -> Path:
        return self.root / f"{name}.npz"

    def save(self, name: str, **arrays) -> Path:
        path = self._path(name)
        np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
        return path

    def load(self, name: str) -> Dict[str, np.ndarray]:
        with np.load(self._path(name)) as data:
            return {k: data[k] for k in data.files}

    def exists(self, name: str) -> bool:
        return self._path(name).exists()

    def maybe_load(self, name: str) -> Optional[Dict[str, np.ndarray]]:
        return self.load(name) if self.exists(name) else None
