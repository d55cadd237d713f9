"""Frontend golden tests vs torch.stft (independent implementation)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from asr_streaming_tpu.ops.frontend import (
    MelConfig, make_mel_params, mel_filterbank, log_mel,
)


def _torch_power_spec(wave: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Power spectrogram via torch.stft — the backend torchaudio's
    MelSpectrogram uses internally."""
    x = torch.from_numpy(wave)
    window = torch.hann_window(cfg.win_length)
    spec = torch.stft(
        x, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, window=window, center=cfg.center,
        pad_mode="reflect", return_complex=True,
    )
    return (spec.abs() ** 2).numpy()  # [B, n_freqs, frames]


@pytest.mark.parametrize("cfg", [MelConfig.for_vietnamese(),
                                 MelConfig.for_english()])
def test_power_spectrogram_matches_torch(cfg):
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 13440)).astype(np.float32) * 0.1

    params = make_mel_params(cfg)
    # Reconstruct power from our conv kernel alone.
    import jax
    spec = jax.lax.conv_general_dilated(
        (jnp.asarray(wave)[:, None, :] if not cfg.center else
         jnp.pad(jnp.asarray(wave), ((0, 0), (cfg.n_fft // 2, cfg.n_fft // 2)),
                 mode="reflect")[:, None, :]),
        params["dft_kernel"], window_strides=(cfg.hop_length,),
        padding="VALID", dimension_numbers=("NCW", "OIW", "NCW"))
    n_freqs = cfg.n_freqs
    ours = np.asarray(spec[:, :n_freqs] ** 2 + spec[:, n_freqs:] ** 2)

    golden = _torch_power_spec(wave, cfg)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-3)


def test_vi_frame_count_is_80():
    cfg = MelConfig.for_vietnamese()
    # 13440-sample chunk (64+16+4 frames at hop 160) -> 80 mel frames
    # (reference geometry, SURVEY.md §6).
    assert cfg.num_frames(13440) == 80


def test_mel_filterbank_properties():
    cfg = MelConfig.for_vietnamese()
    fb = mel_filterbank(cfg)
    assert fb.shape == (401, 128)
    assert (fb >= 0).all()
    # Each filter is a triangle: nonzero support is contiguous.
    for m in range(fb.shape[1]):
        nz = np.nonzero(fb[:, m])[0]
        assert len(nz) > 0
        assert nz[-1] - nz[0] + 1 == len(nz)
    # Peaks sweep upward in frequency.
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_log_mel_end_to_end_shapes_and_finiteness():
    cfg = MelConfig.for_vietnamese()
    params = make_mel_params(cfg)
    wave = jnp.zeros((3, 13440), dtype=jnp.float32)
    out = log_mel(params, cfg, wave)
    assert out.shape == (3, 80, 128)
    # Silence clamps to log(1e-5).
    np.testing.assert_allclose(np.asarray(out), np.log(1e-5), rtol=1e-5)


def test_piecewise_linear_log_regions():
    cfg = MelConfig.for_english()
    params = make_mel_params(cfg)
    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32) * 0.05)
    out = log_mel(params, cfg, wave)
    assert out.shape[2] == 80
    assert np.isfinite(np.asarray(out)).all()


def test_en_global_stats_normalization():
    """The EN path's _GlobalStatsNormalization equivalent: (x-mean)*inv."""
    cfg = MelConfig.for_english()
    params = make_mel_params(cfg)
    rng = np.random.default_rng(2)
    wave = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32)
                       * 0.1)
    base = log_mel(params, cfg, wave)
    mean = jnp.full((cfg.n_mels,), 1.5)
    inv = jnp.full((cfg.n_mels,), 0.5)
    normed = log_mel(params, cfg, wave, mean=mean, invstddev=inv)
    np.testing.assert_allclose(np.asarray(normed),
                               (np.asarray(base) - 1.5) * 0.5, rtol=1e-5)


def test_fast_dft_path_matches_conv_path():
    """The framed-matmul DFT (TPU serving fast path) equals the strided-conv
    spelling.  On TPU they are bit-identical; on CPU the gemm reduction
    order differs with row count, hence the tolerance (and hence the fast
    path being TPU-gated in production — see log_mel)."""
    cfg = MelConfig.for_vietnamese()
    assert cfg.n_fft % cfg.hop_length == 0  # fast path is reachable for vi
    params = make_mel_params(cfg)
    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.standard_normal((4, 13440)).astype(np.float32)
                       * 0.1)
    fast = log_mel(params, cfg, wave, fast_dft=True)
    conv = log_mel(params, cfg, wave, fast_dft=False)
    assert fast.shape == conv.shape == (4, 80, 128)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(conv),
                               rtol=2e-4, atol=2e-4)
