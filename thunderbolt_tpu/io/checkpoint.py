"""Checkpoint/resume: pytree state snapshots + time-series storage.

Parity: ``JLD2Writer`` (``src/ferrite-addons/io.jl:167-221``) — timestep
fields into one archive — and the reference's resume semantics (re-``init``
with a loaded u; ``type.jl:501-507``). Format: compressed .npz with a json
manifest (orbax is available in the image for sharded multi-host
checkpoints; the npz path has zero deps and is byte-stable).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp


def save_checkpoint(path: str, state: Any, meta: Dict = None):
    """Save any pytree of arrays (+ json-able metadata)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(jax.tree_util.tree_structure(state).__repr__()
                   ).encode(), dtype=np.uint8)
    if meta:
        arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                           dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_checkpoint(path: str, like: Any = None):
    """Load; if `like` (a template pytree) is given, unflatten into its
    structure. Returns (state_or_leaves, meta)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    meta = None
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode())
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        tmpl = jax.tree_util.tree_leaves(like)
        if len(leaves) != len(tmpl):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves but the template "
                f"has {len(tmpl)} — structure mismatch")
        for l, t in zip(leaves, tmpl):
            if hasattr(t, "dtype") and l.dtype != np.dtype(t.dtype):
                raise ValueError(
                    f"checkpoint leaf dtype {l.dtype} != template "
                    f"{t.dtype}; bitwise resume requires matching dtypes")
        # restore each leaf as the template's array KIND (device arrays
        # come back as device arrays, so a resumed solve drops straight
        # into the jitted machinery without .at[]-on-numpy surprises);
        # dtypes are never cast — that would break bitwise resume
        leaves = [jnp.asarray(l) if isinstance(t, jnp.ndarray)
                  else np.asarray(l) for l, t in zip(leaves, tmpl)]
        return jax.tree_util.tree_unflatten(treedef, leaves), meta
    return leaves, meta


class TimeSeriesWriter:
    """Append timestep fields to per-step .npz files with a json manifest —
    the checkpoint/IO analog of ``JLD2Writer.store_timestep!``."""

    def __init__(self, name: str, directory: str = "."):
        self.dir = os.path.join(directory, name)
        os.makedirs(self.dir, exist_ok=True)
        self.name = os.path.basename(name)
        self.entries = []

    def store_timestep(self, t, fields: Dict[str, Any]):
        fname = f"{self.name}_{len(self.entries):05d}.npz"
        np.savez_compressed(os.path.join(self.dir, fname),
                            **{k: np.asarray(v) for k, v in fields.items()})
        self.entries.append({"t": float(t), "file": fname})
        return self

    def finalize(self):
        with open(os.path.join(self.dir, f"{self.name}.json"), "w") as f:
            json.dump({"steps": self.entries}, f)
        return self


class TimeSeriesReader:
    def __init__(self, name: str, directory: str = "."):
        self.dir = os.path.join(directory, name)
        self.name = os.path.basename(name)
        with open(os.path.join(self.dir, f"{self.name}.json")) as f:
            self.manifest = json.load(f)

    @property
    def times(self):
        return [e["t"] for e in self.manifest["steps"]]

    def load(self, index: int):
        e = self.manifest["steps"][index]
        data = np.load(os.path.join(self.dir, e["file"]))
        return e["t"], {k: data[k] for k in data.files}
