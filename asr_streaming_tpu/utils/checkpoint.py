"""Parameter checkpointing.

The reference loads Lightning-format torch checkpoints (reference:
lightspeech/models/recognition.py:149-159); this framework's native format
is a flat .npz of the params pytree (portable, no pickle), with an
optional orbax backend for sharded multi-host checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax


SEP = "::"


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        key = SEP.join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        out[key] = np.asarray(leaf)
    return out


def save_params(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str, like=None):
    """Load params; if `like` (a template pytree) is given, restore the
    exact tree structure and dtypes, validating shapes."""
    blob = np.load(path)
    if like is None:
        # return nested dict by splitting keys
        out: dict = {}
        for key in blob.files:
            parts = key.split(SEP)
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = blob[key]
        return out
    flat = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for kp, leaf in flat[0]:
        key = SEP.join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        arr = blob[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(flat[1], leaves)


# ----------------------------------------------------------- orbax backend

def save_params_orbax(directory: str, params) -> None:
    """Sharding-aware checkpoint via orbax (multi-host training jobs);
    the npz format above remains the portable serving format."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        import os
        ckptr.save(os.path.abspath(directory), params, force=True)


def load_params_orbax(directory: str, like):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        import os
        return ckptr.restore(os.path.abspath(directory), like)
