"""Device mesh + sharding layout for multi-chip serving and training.

The reference scales by running N docker workers behind nginx
(reference: README.md:26-38, docker-compose.yml) and has no in-process
collectives (SURVEY.md §2.10).  The TPU-native scaling axes are:

  * ``data``  — streams (serving) / batch (training) sharded across chips;
    encoder state lives sharded on device, so per-tick collectives are zero
    (each chip serves its slice of slots; ICI is only used by training
    all-reduce and any tensor-parallel resharding).
  * ``model`` — tensor-parallel split of the Emformer FFN/attention
    projections for models too large for one chip (not needed at the
    reference's 512-d/20-layer size, but the layout is first-class).

Shardings are expressed as PartitionSpecs over a named Mesh and applied
with NamedSharding; XLA GSPMD inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def param_pspecs(params: dict) -> dict:
    """PartitionSpecs for the model parameter pytree.

    Tensor-parallel layout over the 'model' axis:
      * FFN: w1 [L, D, F] split on F (column), w2 [L, F, D] split on F (row)
        -> one psum per FFN (inserted by GSPMD).
      * Attention q/kv/out projections split on the head dimension.
      * Norms, biases of D-sized outputs, frontend buffers: replicated.
    """
    def spec_for(path: str, x) -> P:
        if x.ndim == 0:
            return P()
        leaf = path.split("/")[-1]
        if leaf in ("ff_w1",):
            return P(None, None, "model")
        if leaf in ("ff_b1",):
            return P(None, "model")
        if leaf in ("ff_w2",):
            return P(None, "model", None)
        if leaf in ("w_q", "w_kv"):
            return P(None, None, "model")
        if leaf in ("b_q", "b_kv"):
            return P(None, "model")
        if leaf in ("w_out",):
            return P(None, "model", None)
        if leaf in ("w1",):          # ctc hidden
            return P(None, "model")
        if leaf in ("b1",) and x.ndim == 1:
            return P("model")
        if leaf in ("w2",):
            return P("model", None)
        return P()  # replicated

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(getattr(k, "key", str(k)) for k in kp)

    specs = {path_str(kp): spec_for(path_str(kp), leaf) for kp, leaf in flat}
    # rebuild tree
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[path_str(kp)] for kp, _ in flat])


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_pspec() -> P:
    return P("data")


def shard_batch(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), tree)
