"""ECAPA-TDNN speaker embedding / verification."""

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.ecapa import (
    EcapaConfig, SpeakerVerifier, ecapa_embed, init_ecapa_params,
)

CFG = EcapaConfig.tiny()


def test_embedding_shape_and_norm():
    params = init_ecapa_params(jax.random.PRNGKey(0), CFG)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 50, CFG.n_mels)), dtype=jnp.float32)
    emb = ecapa_embed(params, CFG, feats)
    assert emb.shape == (2, CFG.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1),
                               1.0, rtol=1e-5)


def test_padding_invariance():
    """Embedding must not depend on padded frames beyond feat_lens."""
    params = init_ecapa_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(1)
    base = rng.standard_normal((1, 40, CFG.n_mels)).astype(np.float32)
    padded = np.concatenate(
        [base, 123.0 * np.ones((1, 20, CFG.n_mels), np.float32)], axis=1)
    e1 = ecapa_embed(params, CFG, jnp.asarray(base), jnp.array([40]))
    e2 = ecapa_embed(params, CFG, jnp.asarray(padded), jnp.array([40]))
    # dilated convs leak a few frames across the boundary; cosine must
    # still be ~1
    cos = float(np.sum(np.asarray(e1) * np.asarray(e2)))
    assert cos > 0.98


def test_verifier_self_similarity():
    params = init_ecapa_params(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(2)
    voice = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    verifier = SpeakerVerifier(params, CFG, voice, threshold=0.45)
    # same audio verifies against itself
    assert verifier.score(voice) > 0.99
    assert verifier(voice)
    # empty segment never verifies
    assert not verifier(np.zeros(0, np.float32))
