"""Checkpoint / resume for simulation states.

The reference writes ADIOS2 checkpoints that only post-processing can read —
there is NO resume path in its solver (SURVEY §5.4).  Here checkpoints are
plain npz archives of the full state pytree + metadata, and `load_state`
reconstructs a KNPEMIState/EMIState so a run can continue exactly where it
stopped (the one capability the reference lacks).
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np
import jax.numpy as jnp


def _mesh_fingerprint(mesh) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(mesh.points).tobytes())
    h.update(np.ascontiguousarray(mesh.cells).tobytes())
    return h.hexdigest()[:16]


def config_fingerprint(cfg) -> str:
    """Hash the physics-relevant config so a checkpoint cannot silently
    resume under a different dt / model stack / ion set."""
    raw = getattr(cfg, "raw", cfg)
    payload = json.dumps(raw, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_state(filename: str, state, mesh=None, step: int | None = None,
               config=None, extra: dict | None = None):
    """Write a state NamedTuple to an npz checkpoint."""
    payload = {f"state__{k}": np.asarray(v) for k, v in state._asdict().items()}
    meta = {"fields": list(state._asdict().keys()),
            "state_type": type(state).__name__}
    if step is not None:
        meta["step"] = step
    if mesh is not None:
        meta["mesh_fingerprint"] = _mesh_fingerprint(mesh)
    if config is not None:
        meta["config_fingerprint"] = config_fingerprint(config)
    if extra:
        meta["extra"] = extra
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    np.savez_compressed(filename, **payload)


def load_state(filename: str, state_cls, mesh=None, dtype=None, config=None):
    """Load a checkpoint back into `state_cls` (e.g. KNPEMIState).

    If `mesh` (or `config`) is given, the stored fingerprint is validated so
    a checkpoint cannot silently resume on a different mesh (or with a
    different dt / model stack).
    Returns (state, meta).
    """
    with np.load(filename) as data:
        meta = json.loads(bytes(data["meta_json"]).decode())
        if mesh is not None and "mesh_fingerprint" in meta:
            fp = _mesh_fingerprint(mesh)
            if fp != meta["mesh_fingerprint"]:
                raise ValueError(
                    f"Checkpoint {filename} was written for a different mesh "
                    f"({meta['mesh_fingerprint']} != {fp})")
        if config is not None and "config_fingerprint" in meta:
            fp = config_fingerprint(config)
            if fp != meta["config_fingerprint"]:
                raise ValueError(
                    f"Checkpoint {filename} was written under a different "
                    f"config ({meta['config_fingerprint']} != {fp}); refusing "
                    f"to resume with changed dt/models/ions")
        kwargs = {}
        for k in meta["fields"]:
            arr = data[f"state__{k}"]
            kwargs[k] = jnp.asarray(arr, dtype=dtype) if dtype else jnp.asarray(arr)
    return state_cls(**kwargs), meta
