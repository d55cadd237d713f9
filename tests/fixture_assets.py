"""Committed trained-fixture assets for the golden-loop test suites.

VERDICT r4 #5 (third rng-fragility strike): the overfit CTC/RNNT/VAD/
speaker fixtures re-trained toy models at module scope on EVERY suite
run — ~17 of the suite's 39 minutes — and their convergence was the
suite's only rng-sensitive surface.  The structural fix is the
assets/bench_vad.npz pattern generalized: `tools/make_test_fixtures.py`
trains each fixture ONCE (under the test env's exact 8-virtual-device
CPU mesh) and commits the weights under ``assets/test_fixtures/``;
fixtures then LOAD the asset and re-run their acceptance check on the
current host (a single forward/serve pass, seconds).  The acceptance
check is the same one that gated training, so correctness is never
weakened: if this host's float behavior (or a code change) breaks the
stored weights' golden property, the fixture falls back to training
exactly as before — slow, loud, still green.

Set ``ASR_NO_FIXTURE_ASSETS=1`` to skip loading (forces the training
path, used when regenerating assets and for auditing the fallback).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "test_fixtures")

logger = logging.getLogger("asr_streaming_tpu.tests.fixtures")


def asset_path(name: str) -> str:
    return os.path.join(ASSET_DIR, f"{name}.npz")


def load_asset(name: str, like=None) -> Optional[Tuple[Any, Dict]]:
    """Returns (params_tree, meta_dict) or None when absent/disabled.

    Pass ``like`` (a template pytree, e.g. ``init_*_params(key, cfg)``)
    when the fixture's params tree contains lists/tuples — the untyped
    nested-dict load cannot reconstruct those."""
    if os.environ.get("ASR_NO_FIXTURE_ASSETS"):
        return None
    path = asset_path(name)
    if not os.path.exists(path):
        return None
    try:
        from asr_streaming_tpu.utils.checkpoint import load_params
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
        if like is not None:
            # load_params(like=...) reads only the template's keys, so
            # the extra __meta__ entry is naturally ignored
            params = load_params(path, like=like)
        else:
            params = load_params(path)
            params.pop("__meta__", None)
        return params, meta
    except Exception:
        logger.exception("fixture asset %s failed to load — retraining",
                         name)
        return None


def save_asset(name: str, params, meta: Dict) -> str:
    """Write params + JSON meta into one npz (tools/make_test_fixtures)."""
    import jax

    from asr_streaming_tpu.utils.checkpoint import _flatten
    os.makedirs(ASSET_DIR, exist_ok=True)
    path = asset_path(name)
    flat = _flatten(jax.tree.map(np.asarray, params))
    flat["__meta__"] = np.str_(json.dumps(meta))
    np.savez(path, **flat)
    return path
