"""Training losses: RNNT vs brute-force DP, AM-softmax, BEST-RQ, STFT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.train.losses import (
    additive_margin_softmax_loss, init_am_softmax_params,
    init_random_quantizer, least_squares_adversarial_loss,
    least_squares_generative_loss, multi_resolution_stft_loss,
    random_quantization_loss, rnnt_loss, sequence_to_sequence_loss,
    temporal_prediction_loss,
)
from asr_streaming_tpu.train.ctc import noam_annealing


def _np_rnnt_logp(logp, target, blank=0):
    """Brute-force RNNT forward DP for one sequence (float64)."""
    T, U1, V = logp.shape
    U = len(target)
    NEG = -np.inf
    alpha = np.full((T + 1, U + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(T + 1):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0 and t > 0:
                # emit label u-1 at frame t-1 (after consuming t-1 frames)
                cands.append(alpha[t - 1, u - 1]
                             + logp[t - 1, u - 1, target[u - 1]])
            if cands:
                m = max(cands)
                if m > NEG:
                    alpha[t, u] = m + np.log(sum(np.exp(c - m)
                                                 for c in cands))
    return alpha[T, U]


def _np_rnnt_logp_frame_tied(logp, target, blank=0):
    """DP where emissions don't consume frames (standard RNNT lattice)."""
    T, U1, V = logp.shape
    U = len(target)
    NEG = -np.inf
    alpha = np.full((T, U + 1), NEG)
    # emissions at frame 0 before any blank
    alpha[0, 0] = 0.0
    for u in range(1, U + 1):
        alpha[0, u] = alpha[0, u - 1] + logp[0, u - 1, target[u - 1]]
    for t in range(1, T):
        for u in range(U + 1):
            alpha[t, u] = alpha[t - 1, u] + logp[t - 1, u, blank]
            if u > 0:
                a = alpha[t, u - 1] + logp[t, u - 1, target[u - 1]]
                m = max(alpha[t, u], a)
                if m > NEG:
                    alpha[t, u] = m + np.log(
                        np.exp(alpha[t, u] - m) + np.exp(a - m))
    return alpha[T - 1, U] + logp[T - 1, U, blank]


def test_rnnt_loss_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, T, U, V = 2, 5, 3, 7
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)

    loss = float(rnnt_loss(jnp.asarray(logits),
                           jnp.full((B,), T, jnp.int32),
                           jnp.asarray(targets),
                           jnp.full((B,), U, jnp.int32)))
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    want = -np.mean([_np_rnnt_logp_frame_tied(logp[b], targets[b])
                     for b in range(B)])
    assert loss == pytest.approx(want, rel=1e-4)


def test_rnnt_loss_variable_lengths():
    rng = np.random.default_rng(1)
    B, T, U, V = 3, 6, 4, 5
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)
    t_lens = np.array([6, 4, 5], np.int32)
    u_lens = np.array([4, 2, 3], np.int32)
    loss = float(rnnt_loss(jnp.asarray(logits), jnp.asarray(t_lens),
                           jnp.asarray(targets), jnp.asarray(u_lens)))
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    want = -np.mean([
        _np_rnnt_logp_frame_tied(logp[b, :t_lens[b]],
                                 targets[b, :u_lens[b]])
        for b in range(B)])
    assert loss == pytest.approx(want, rel=1e-4)


def test_am_softmax_correct_class_wins():
    key = jax.random.PRNGKey(0)
    params = init_am_softmax_params(key, 8, 4)
    # embed = class prototype -> should predict correctly, low loss
    protos = np.asarray(params["W"]).T  # [4, 8]
    x = jnp.asarray(protos * 10, dtype=jnp.float32)
    labels = jnp.arange(4)
    loss, preds = additive_margin_softmax_loss(params, x, labels)
    assert np.isfinite(float(loss))
    # margin reduces the true-class logit; most predictions still correct
    assert int(jnp.sum(preds == labels)) >= 3


def test_random_quantization_loss_runs():
    key = jax.random.PRNGKey(1)
    params = init_random_quantizer(key, feature_dim=16, encoder_dim=12,
                                   quantizer_size=8, vocabulary_size=20)
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal((2, 10, 12)), dtype=jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 10, 16)), dtype=jnp.float32)
    loss = random_quantization_loss(params, enc, jnp.array([10, 6]), feats)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_gan_losses():
    outs = [jnp.asarray([0.8, 0.9]), jnp.asarray([0.5])]
    tgts = [jnp.asarray([1.0, 1.0]), jnp.asarray([1.0])]
    g = float(least_squares_generative_loss(outs))
    a = float(least_squares_adversarial_loss(outs, tgts))
    assert g == pytest.approx(((0.04 + 0.01) / 2 + 0.25) / 2)
    assert a > 0


def test_stft_loss_zero_for_identical():
    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.standard_normal((2, 3000)), dtype=jnp.float32)
    lens = jnp.array([3000, 2000])
    loss = float(multi_resolution_stft_loss(wave, wave, lens,
                                            resolutions=((512, 240, 50),)))
    assert loss == pytest.approx(0.0, abs=1e-5)
    # different signals -> positive
    other = jnp.asarray(rng.standard_normal((2, 3000)), dtype=jnp.float32)
    assert float(multi_resolution_stft_loss(
        wave, other, lens, resolutions=((512, 240, 50),))) > 0.1


def test_temporal_prediction_loss():
    outs = jnp.asarray([[1.0, 2.0, 1.0]])
    tgts = jnp.asarray([[1.0, 2.0, 0.0]])   # third position masked (log=min)
    loss = float(temporal_prediction_loss(outs, tgts))
    assert loss == pytest.approx(0.0, abs=1e-9)


def test_noam_annealing_shape():
    sched = noam_annealing(1.0, d_model=512, warmup_steps=100)
    lrs = [float(sched(s)) for s in [1, 50, 100, 200, 10000]]
    assert lrs[0] < lrs[1] < lrs[2]          # warmup rising
    assert lrs[2] >= lrs[3] >= lrs[4]        # decay after warmup
