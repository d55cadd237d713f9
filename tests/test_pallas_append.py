"""Pallas emission-append kernel vs the XLA scatter oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.ops.pallas_append import (
    emission_append, emission_append_xla,
)


@pytest.mark.parametrize("B,max_t,U,V,dtype", [
    (8, 64, 16, 37, jnp.float16),     # CTC-shaped (unaligned vocab)
    (8, 64, 16, 128, jnp.float32),
    (5, 32, 4, 24, jnp.float16),      # RNNT-shaped (U=4, odd B)
    (3, 48, 16, 804, jnp.bfloat16),   # real vocab width
])
def test_kernel_matches_oracle(B, max_t, U, V, dtype):
    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.standard_normal((B, max_t, V)), dtype)
    rows = jnp.asarray(rng.standard_normal((B, U, V)), jnp.float32)
    # positions: multiples of U, including the clip boundary and 0
    pos = jnp.asarray(
        rng.integers(0, max_t // U, B) * U, jnp.int32)
    decode = jnp.asarray(rng.integers(0, 2, B).astype(bool))

    got = emission_append(buf, rows, pos, decode, interpret=True)
    want = emission_append_xla(buf, rows, pos, decode)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_all_decode_and_none_decode():
    B, max_t, U, V = 4, 32, 8, 16
    rng = np.random.default_rng(1)
    buf = jnp.asarray(rng.standard_normal((B, max_t, V)), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((B, U, V)), jnp.float32)
    pos = jnp.asarray([0, 8, 16, 24], jnp.int32)

    none = emission_append(buf, rows, pos, jnp.zeros(B, bool),
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(none), np.asarray(buf))

    alld = emission_append(buf, rows, pos, jnp.ones(B, bool),
                           interpret=True)
    want = emission_append_xla(buf, rows, pos, jnp.ones(B, bool))
    np.testing.assert_array_equal(np.asarray(alld), np.asarray(want))


def test_sequential_appends_accumulate():
    """Simulates the serving loop: three ticks of appends build a
    contiguous emission prefix per slot."""
    B, max_t, U, V = 2, 64, 16, 12
    buf = jnp.zeros((B, max_t, V), jnp.float32)
    lengths = np.zeros(B, np.int64)
    rng = np.random.default_rng(2)
    history = [[] for _ in range(B)]
    for tick in range(3):
        rows = jnp.asarray(rng.standard_normal((B, U, V)), jnp.float32)
        decode = jnp.asarray([True, tick % 2 == 0])
        pos = jnp.asarray(lengths, jnp.int32)
        buf = emission_append(buf, rows, pos, decode, interpret=True)
        for b in range(B):
            if bool(decode[b]):
                history[b].append(np.asarray(rows[b]))
                lengths[b] += U
    out = np.asarray(buf)
    for b in range(B):
        want = np.concatenate(history[b]) if history[b] else \
            np.zeros((0, V), np.float32)
        np.testing.assert_array_equal(out[b, :lengths[b]], want)
        np.testing.assert_array_equal(out[b, lengths[b]:], 0.0)


def test_packed_f16_storage_roundtrip():
    """serving's packed-f16 emission storage: pack on device, unpack on
    host, f16-exact."""
    import dataclasses
    from asr_streaming_tpu.models.asr import ASRConfig
    from asr_streaming_tpu.models.serving import (
        ServingConfig, _pack_f16_rows, _unpack_f16_rows,
        init_emission_buffer, make_emission_fetcher,
    )
    for V in (37, 804):              # odd + production widths
        rng = np.random.default_rng(V)
        rows = rng.standard_normal((3, 16, V)).astype(np.float32)
        packed = _pack_f16_rows(jnp.asarray(rows))
        assert packed.dtype == jnp.float32
        assert packed.shape == (3, 16, (V + 1) // 2)
        got = _unpack_f16_rows(np.asarray(packed).reshape(-1, packed.shape[2]),
                               V).reshape(3, 16, V)
        np.testing.assert_array_equal(got,
                                      rows.astype(np.float16)
                                      .astype(np.float32))

    # buffer + fetcher end-to-end (CTC config, f16 default)
    asr_cfg = ASRConfig.vietnamese()
    asr_cfg = dataclasses.replace(
        asr_cfg, encoder=dataclasses.replace(asr_cfg.encoder, vocab_size=37))
    cfg = ServingConfig(asr=asr_cfg)
    buf = init_emission_buffer(cfg, 4)
    assert buf.dtype == jnp.float32 and buf.shape[2] == 19
    rows = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((4, 16, 37)), jnp.float32)
    from asr_streaming_tpu.ops.pallas_append import emission_append_xla
    buf = emission_append_xla(buf, _pack_f16_rows(rows),
                              jnp.zeros(4, jnp.int32), jnp.ones(4, bool))
    fetch = make_emission_fetcher(cfg)
    out = fetch(buf, 2, 16)
    np.testing.assert_array_equal(
        out, np.asarray(rows[2], np.float16).astype(np.float32))
