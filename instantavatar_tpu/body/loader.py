"""SMPL asset loading.

Loads the standard ``SMPL_{GENDER}.pkl`` releases (which contain chumpy
arrays and scipy sparse matrices — handled without chumpy installed via a
stub unpickler) or a converted ``.npz``. Mirrors what the reference loads in
its vendored smplx fork (body_models.py: model_path + gender resolution).
"""
from __future__ import annotations

import pickle
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .smpl import NUM_BETAS, SMPLModel

__all__ = ["load_smpl_model", "find_model_file"]


class _ChumpyStub:
    """Captures pickled chumpy object state; exposes the wrapped ndarray."""

    def __init__(self, *args, **kwargs):
        self._state = None

    def __setstate__(self, state):
        self._state = state

    def to_array(self):
        state = self._state
        if isinstance(state, dict):
            for key in ("x", "a", "v", "_data"):
                if key in state and isinstance(state[key], np.ndarray):
                    return state[key]
            for v in state.values():
                if isinstance(v, np.ndarray):
                    return v
                if isinstance(v, _ChumpyStub):
                    arr = v.to_array()
                    if arr is not None:
                        return arr
        return None


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        return super().find_class(module, name)


def _as_array(obj) -> np.ndarray:
    if isinstance(obj, _ChumpyStub):
        arr = obj.to_array()
        if arr is None:
            raise ValueError("could not extract array from chumpy object")
        return np.asarray(arr)
    if hasattr(obj, "toarray"):  # scipy sparse (J_regressor)
        return np.asarray(obj.toarray())
    return np.asarray(obj)


def find_model_file(model_path: str | Path, gender: str = "neutral") -> Path:
    """Resolve a model file: a direct file path, or a dir holding
    SMPL_{GENDER}.pkl / .npz (case-insensitive gender)."""
    p = Path(model_path)
    if p.is_file():
        return p
    gender = gender.upper()
    for name in (f"SMPL_{gender}.pkl", f"SMPL_{gender}.npz",
                 f"smpl/SMPL_{gender}.pkl", f"smpl/SMPL_{gender}.npz",
                 f"SMPL_{gender.lower()}.pkl"):
        cand = p / name
        if cand.exists():
            return cand
    raise FileNotFoundError(
        f"no SMPL model for gender={gender!r} under {model_path!r}")


def load_smpl_model(model_path: str | Path, gender: str = "neutral",
                    num_betas: int = NUM_BETAS) -> SMPLModel:
    path = find_model_file(model_path, gender)
    if path.suffix == ".npz":
        with np.load(path, allow_pickle=True) as data:
            raw = {k: data[k] for k in data.files}
    else:
        with open(path, "rb") as f:
            raw = _StubUnpickler(f, encoding="latin1").load()

    v_template = _as_array(raw["v_template"]).astype(np.float32)
    shapedirs = _as_array(raw["shapedirs"]).astype(np.float32)[..., :num_betas]
    posedirs = _as_array(raw["posedirs"]).astype(np.float32)
    if posedirs.ndim == 3:  # (V, 3, 207) → (207, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = _as_array(raw["J_regressor"]).astype(np.float32)
    weights = _as_array(raw["weights"]).astype(np.float32)
    parents = _as_array(raw["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    faces = _as_array(raw.get("f", raw.get("faces"))).astype(np.int64)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        parents=np.asarray(parents),
        faces=np.asarray(faces),
    )
