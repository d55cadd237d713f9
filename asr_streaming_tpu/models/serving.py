"""The fused per-tick serving step: VAD + gate + encoder + greedy, one jit.

This is the TPU-native replacement for the reference's per-connection
inline pipeline (reference: streaming_decoder/streaming_server.py:371-470)
and its v1 batching engine (streaming_decoder_v1/streaming_asr.py:41-119).
The reference routes each stream's chunk through webrtcvad -> Silero ->
encoder with host-side branching; here ALL stages run for ALL slots in one
fixed-shape jitted step, and the routing decision is computed *on device*:

    decode[b] = active[b] & (contain_token[b] | (gate[b] & silero[b]))

Encoder state only advances for slots that decode (masked select), and
slots flagged ``reset`` start from zero state (the reference's
``stream.state = state_init`` after each final segment,
streaming_server.py:531).  One host<->device round trip per tick,
regardless of how many streams are active — the XLA-recompile failure mode
the reference's TorchScript comments warn about (streaming_server.py:666-675)
is eliminated by construction.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.asr import (
    ASRConfig, asr_stream_step, init_asr_params, init_asr_state,
)
from asr_streaming_tpu.models.emformer import EmformerState
from asr_streaming_tpu.models.rnnt import (
    RNNTConfig, RNNTStreamState, init_rnnt_params, init_rnnt_state,
    rnnt_greedy_stream_step,
)
from asr_streaming_tpu.models.vad import (
    SileroConfig, init_silero_params, silero_chunk_probs, silence_runs,
    energy_gate,
)
from asr_streaming_tpu.ops.frontend import MelConfig, make_mel_params, log_mel
from asr_streaming_tpu.ops.pallas_append import (
    append_supported, emission_append, emission_append_xla,
)


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    asr: ASRConfig = dataclasses.field(default_factory=ASRConfig)
    silero: SileroConfig = dataclasses.field(default_factory=SileroConfig)
    vad_threshold: float = 0.5
    energy_threshold_db: float = -55.0
    use_energy_gate: bool = True
    # Use the neural VAD for the second stage; when False, per-window energy
    # substitutes (deterministic — for tests and for deployments without
    # trained VAD weights).
    use_silero: bool = True
    # "ctc" (Vietnamese LightningASR path) or "rnnt" (English EmformerRNNT
    # path, reference streaming_server.py:441-465).
    model_kind: str = "ctc"
    rnnt: Optional["RNNTConfig"] = None
    # Device-resident emission ring buffer length (CTC path).  Emissions
    # stay in HBM and are fetched host-side only at segment finals —
    # transferring [B, U, V] log-probs every tick costs ~10x the compute
    # step over a thin host link.  1024 frames = 40.96 s > the 40 s hard
    # endpoint flush (asr-online.yaml:103-107).
    max_emission_frames: int = 1024
    emission_dtype: str = "float16"
    # Host->device audio encoding.  "int16" is lossless PCM (default);
    # "mulaw" (G.711 mu-law, 8-bit) halves the upload bytes — the serving
    # bottleneck on thin host links — at telephony-grade fidelity.
    upload_encoding: str = "int16"
    # Path to the reference EN pipeline's global-stats JSON
    # (``{model_dir}/emformer-rnnt/global_stats_rnnt.json``, reference
    # recognition.py:107 _GlobalStatsNormalization): when set, the
    # en_frontend params carry mean/invstddev and the serving featurizer
    # applies (x - mean) * invstddev after the piecewise-linear-log —
    # required for real reference RNNT checkpoints to see the feature
    # distribution they were trained on.
    en_global_stats: Optional[str] = None
    # Device-batched per-chunk RNNT beam search (EN beam-partials mode,
    # models/rnnt_beam.py): beam width, or None for greedy partials +
    # beam-rescored finals.  When set, the serving step replaces the
    # device greedy decode with the batched beam — the reference's exact
    # per-chunk beam contract (streaming_server.py:445) at batch scale —
    # and the pack carries the best hypothesis's token buffer.
    en_beam_width_device: Optional[int] = None
    # Per-segment token-buffer capacity for the device beam.  EN segments
    # hard-flush at 30 s (asr-online-en.yaml); BPE-4096 English runs
    # ~5 tokens/s, so 256 is ~1.7x headroom.  Overflow drops tokens
    # loudly at the buffer tail rather than corrupting earlier ones.
    en_beam_cap: int = 256


# Host-pack layout: one [B, 5 + n] float32 array per tick (a single
# device->host transfer; per-transfer latency dominates on thin links).
PACK_DECODED, PACK_GATE, PACK_SILERO, PACK_LEAD, PACK_TRAIL, PACK_DATA = \
    0, 1, 2, 3, 4, 5


class ServingTickOutput(NamedTuple):
    pack: jax.Array              # [B, 5+n] f32 (flags, lead, trail, data)
    state: "ServingState"
    emission: Optional[jax.Array]  # [B, MAX_T, V] device-resident (CTC)
    ctx: jax.Array               # [B, buffer_length] device-resident audio
                                 # context (the ring buffer's carried tail)


class BeamServingState(NamedTuple):
    """EN beam-partials device state: encoder stream state + the carried
    B x W hypothesis beam (models/rnnt_beam.py).  The greedy path's
    predictor/last_token live inside the beam's hypotheses instead."""
    encoder: EmformerState
    beam: "BeamState"            # forward ref: models/rnnt_beam.py


ServingState = Union[EmformerState, RNNTStreamState, BeamServingState]


def init_serving_params(key: jax.Array, cfg: ServingConfig) -> dict:
    k1, k2 = jax.random.split(key)
    if cfg.model_kind == "rnnt":
        assert cfg.rnnt is not None
        en_frontend = make_mel_params(MelConfig.for_english()
                                      if cfg.rnnt.n_mels == 80 else
                                      _tiny_en_mel(cfg.rnnt.n_mels))
        if cfg.en_global_stats:
            from asr_streaming_tpu.ops.frontend import load_global_stats
            mean, invstd = load_global_stats(cfg.en_global_stats)
            en_frontend["mean"] = mean
            en_frontend["invstddev"] = invstd
        return {
            **init_rnnt_params(k1, cfg.rnnt),
            "en_frontend": en_frontend,
            "vad": init_silero_params(k2, cfg.silero),
        }
    return {
        **init_asr_params(k1, cfg.asr),
        "vad": init_silero_params(k2, cfg.silero),
    }


def _tiny_en_mel(n_mels: int) -> MelConfig:
    return dataclasses.replace(MelConfig.for_english(), n_mels=n_mels)


def init_serving_state(cfg: ServingConfig, max_slots: int) -> ServingState:
    if cfg.model_kind == "rnnt":
        if cfg.en_beam_width_device:
            from asr_streaming_tpu.models.emformer import (
                init_emformer_state,
            )
            from asr_streaming_tpu.models.rnnt_beam import init_beam_state
            return BeamServingState(
                encoder=init_emformer_state(cfg.rnnt.emformer, max_slots),
                beam=init_beam_state(cfg.rnnt, max_slots,
                                     cfg.en_beam_width_device,
                                     cap=cfg.en_beam_cap))
        return init_rnnt_state(cfg.rnnt, max_slots)
    return init_asr_state(cfg.asr, max_slots)


# (per-slot state selection now lives inside the encoder step — fused in
# VMEM on the Pallas path, jnp.where on the XLA oracle path; see
# emformer_stream_step's reset/advance)


def emission_width(cfg: ServingConfig) -> int:
    """Logical per-frame width of the emission buffer (V or E)."""
    return (cfg.rnnt.encoding_dim if cfg.model_kind == "rnnt"
            else cfg.asr.encoder.vocab_size)


def _emission_packed(cfg: ServingConfig) -> bool:
    # float16 rows are stored as packed f32 bit-pairs: Mosaic has no f16
    # lanes, and bitcasting the WHOLE buffer around the append kernel
    # forces an 842 MB relayout copy per tick (measured ~28 ms at 512
    # slots).  Packing at the storage level keeps f16 fidelity while the
    # kernel and all device ops see native f32; the host unpacks with a
    # zero-copy np view at fetch time.
    return cfg.emission_dtype == "float16"


def _pack_f16_rows(rows: jax.Array) -> jax.Array:
    """[B, U, V] float -> [B, U, ceil(V/2)] f32 holding f16 bit pairs."""
    B, U, V = rows.shape
    h = rows.astype(jnp.float16)
    if V % 2:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, 1)))
    return jax.lax.bitcast_convert_type(
        h.reshape(B, U, (V + 1) // 2, 2), jnp.float32)


def _unpack_f16_rows(arr: "np.ndarray", V: int) -> "np.ndarray":
    """Host side: [L, ceil(V/2)] f32 bit-pairs -> [L, V] f32."""
    import numpy as np
    flat = np.ascontiguousarray(arr).view(np.float16)
    return flat.reshape(arr.shape[0], -1)[:, :V].astype(np.float32)


def init_emission_buffer(cfg: ServingConfig, max_slots: int) -> jax.Array:
    """Device-resident per-slot ring buffer: CTC log-probs [B, MAX_T, V]
    (vi path) or transcriber encodings [B, MAX_T, E] (rnnt path, consumed
    by the host beam rescorer at finals).  float16 rows are stored packed
    (see _emission_packed)."""
    width = emission_width(cfg)
    if _emission_packed(cfg):
        return jnp.zeros(
            (max_slots, cfg.max_emission_frames, (width + 1) // 2),
            dtype=jnp.float32)
    return jnp.zeros((max_slots, cfg.max_emission_frames, width),
                     dtype=jnp.dtype(cfg.emission_dtype))


def make_emission_fetcher(cfg: ServingConfig):
    """Bucketed jitted fetch of one slot's accumulated emission.

    Returns fetch(emission_buf, slot, length) -> np [length, V] f32;
    each power-of-two bucket compiles once.  Packed-f16 storage is
    unpacked host-side (zero-copy np view)."""
    import numpy as np

    fetchers = {}
    packed = _emission_packed(cfg)
    width = emission_width(cfg)

    def fetch(buf, slot: int, length: int):
        bucket = 128
        while bucket < length:
            bucket *= 2
        bucket = min(bucket, cfg.max_emission_frames)
        if bucket not in fetchers:
            fetchers[bucket] = jax.jit(
                lambda b, s: jax.lax.dynamic_slice(
                    b, (s, 0, 0),
                    (1, bucket, b.shape[2]))[0].astype(jnp.float32),
                static_argnums=())
        out = np.asarray(fetchers[bucket](buf, jnp.int32(slot)))[:length]
        return _unpack_f16_rows(out, width) if packed else out

    return fetch


def _pack(decode, gate, silero, lead, trail, data_f32):
    cols = [decode.astype(jnp.float32)[:, None],
            gate.astype(jnp.float32)[:, None],
            silero.astype(jnp.float32)[:, None],
            lead.astype(jnp.float32)[:, None],
            trail.astype(jnp.float32)[:, None],
            data_f32]
    return jnp.concatenate(cols, axis=1)


def init_audio_context(cfg: ServingConfig, max_slots: int) -> jax.Array:
    """Device-resident carried audio context [B, buffer_length] — the
    leading (context+bias) samples of each slot's next chunk window.
    Kept on device so only NEW audio crosses the host link each tick
    (uploading full overlapping windows costs ~30% extra bytes, and the
    host link is the serving bottleneck on thin transports)."""
    return jnp.zeros((max_slots, cfg.asr.audio.buffer_length), jnp.float32)


MU = 255.0
_MULAW_LUT = None


def mulaw_encode_host(x: "np.ndarray"):
    """float [-1,1] -> uint8 G.711-style mu-law (host side).

    Implemented as an int16 quantize + 64K-entry lookup: the closed-form
    log1p over a full 512-slot tick (5.2M samples) costs ~400 ms of host
    time — more than the entire tick budget — while the LUT path is
    ~50 ms.  The int16 pre-quantization adds <=3e-5 error, far below
    mu-law's own quantization step."""
    import numpy as np
    global _MULAW_LUT
    if _MULAW_LUT is None:
        # LUT indexed by the int16 bit pattern viewed as uint16
        i16 = np.arange(65536, dtype=np.uint16).view(np.int16)
        v = i16.astype(np.float64) / 32767.0
        y = np.sign(v) * np.log1p(MU * np.abs(np.clip(v, -1, 1))) \
            / np.log1p(MU)
        _MULAW_LUT = np.round((y + 1.0) * 127.5).astype(np.uint8)
    scaled = np.clip(x * 32767.0, -32768, 32767)
    return _MULAW_LUT[scaled.astype(np.int16).view(np.uint16)]


def _mulaw_decode(u8: jax.Array) -> jax.Array:
    y = u8.astype(jnp.float32) / 127.5 - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + MU, jnp.abs(y)) - 1.0) / MU


def _assemble_wave(cfg: ServingConfig, segment_i16: jax.Array,
                   ctx: jax.Array, active: jax.Array,
                   new_stream: jax.Array):
    """Encoded new segment + carried context -> float chunk window;
    also returns the updated context (advances only for active slots)."""
    if cfg.upload_encoding == "mulaw":
        seg = _mulaw_decode(segment_i16)
    else:
        seg = segment_i16.astype(jnp.float32) / 32768.0
    ctx = jnp.where(new_stream[:, None], 0.0, ctx)
    wave = jnp.concatenate([ctx, seg], axis=1)
    buffer_len = ctx.shape[1]
    new_ctx = jnp.where(active[:, None], seg[:, -buffer_len:], ctx)
    return wave, new_ctx


def serving_step(params: dict, cfg: ServingConfig, segment_i16: jax.Array,
                 contain_token: jax.Array, active: jax.Array,
                 new_stream: jax.Array, reset: jax.Array,
                 state: EmformerState, ctx: jax.Array,
                 emission_buf: jax.Array) -> ServingTickOutput:
    """One batched decode tick (CTC / Vietnamese path).

    Args:
      segment_i16: [B, segment_length] int16 — each active slot's NEW
        audio; the carried (context+bias) window prefix lives on device
        in ``ctx`` (the reference's ring buffer head, stream.py:23).
      contain_token: [B] bool — stream already has tokens in the current
        utterance (VADs bypassed, reference streaming_server.py:374-390).
      active: [B] bool — slot holds a stream with a ready chunk.
      new_stream: [B] bool — zero the audio context (fresh connection).
      reset: [B] bool — zero this slot's encoder state before stepping
        (new stream or just-finalized segment; audio context carries
        across segment finals like the reference's ring buffer).
      emission_buf: [B, MAX_T, V] device-resident emission accumulator;
        decoded frames are written at the slot's current length.
    """
    wave, new_ctx = _assemble_wave(cfg, segment_i16, ctx, active,
                                   new_stream)

    audio_cfg = cfg.asr.audio
    gate, silero_speech, lead, trail = _vad_stage(
        params, cfg, wave, audio_cfg.buffer_length, audio_cfg.sample_rate)

    decode = active & (contain_token | (gate & silero_speech))

    # reset/advance are applied INSIDE the encoder step (the fused Pallas
    # layer masks them in VMEM; the XLA oracle path uses equivalent
    # jnp.where selects) — no full-state traversals out here.
    out = asr_stream_step(params, cfg.asr, wave, state, reset=reset,
                          advance=decode)
    new_state = out.state

    # Append emissions at each slot's pre-step length.  On TPU this is a
    # Pallas kernel writing ONLY the B x U new rows in place (the vmapped
    # dynamic_update_slice spelling lowers to a whole-buffer scatter —
    # measured 30 ms/step at 512 slots vs ~0.3 ms for the kernel).
    B, U, V = out.log_probs.shape
    pre_len = jnp.where(reset, 0, state.length)
    pos = jnp.clip(pre_len, 0, cfg.max_emission_frames - U)
    rows = (_pack_f16_rows(out.log_probs) if _emission_packed(cfg)
            else out.log_probs.astype(emission_buf.dtype))
    emission_buf = _append(emission_buf, rows, pos, decode)

    pack = _pack(decode, gate, silero_speech, lead, trail,
                 out.argmax.astype(jnp.float32))
    return ServingTickOutput(pack=pack, state=new_state,
                             emission=emission_buf, ctx=new_ctx)


def _append(emission_buf: jax.Array, rows: jax.Array, pos: jax.Array,
            decode: jax.Array) -> jax.Array:
    """Per-slot row append: Pallas in-place kernel on TPU, XLA oracle
    elsewhere (ops/pallas_append.py)."""
    max_t = emission_buf.shape[1]
    U = rows.shape[1]
    if jax.default_backend() == "tpu" and append_supported(max_t, U):
        return emission_append(emission_buf, rows, pos, decode)
    return emission_append_xla(emission_buf, rows, pos, decode)


def _vad_stage(params: dict, cfg: ServingConfig, wave: jax.Array,
               buffer_length: int, sample_rate: int):
    new_segment = wave[:, buffer_length:]
    if cfg.use_energy_gate:
        gate = energy_gate(new_segment, sample_rate,
                           threshold_db=cfg.energy_threshold_db)
    else:
        gate = jnp.ones(wave.shape[0], bool)
    if cfg.use_silero:
        probs = silero_chunk_probs(params["vad"], cfg.silero, wave)
        speech_windows = probs > cfg.vad_threshold
    else:
        w = cfg.silero.window
        n_win = wave.shape[1] // w
        frames = wave[:, :n_win * w].reshape(wave.shape[0], n_win, w)
        db = 10.0 * jnp.log10(jnp.mean(frames ** 2, axis=-1) + 1e-12)
        speech_windows = db > cfg.energy_threshold_db
    silero_speech = jnp.any(speech_windows, axis=1)
    window_seconds = cfg.silero.window / cfg.silero.sample_rate
    lead, trail = silence_runs(speech_windows, window_seconds)
    return gate, silero_speech, lead, trail


def serving_step_rnnt(params: dict, cfg: ServingConfig,
                      segment_i16: jax.Array, contain_token: jax.Array,
                      active: jax.Array, new_stream: jax.Array,
                      reset: jax.Array, state: RNNTStreamState,
                      ctx: jax.Array,
                      emission_buf: Optional[jax.Array] = None
                      ) -> ServingTickOutput:
    """English-path tick: VAD + batched device-side greedy RNNT decode
    (reference streaming_server.py:441-465 runs torchaudio beam search on
    host per stream; here greedy decode is batched on device, with the
    host beam available for final rescoring)."""
    wave, new_ctx = _assemble_wave(cfg, segment_i16, ctx, active,
                                   new_stream)
    rnnt = cfg.rnnt
    zero = init_rnnt_state(rnnt, wave.shape[0])
    state = jax.tree.map(
        lambda z, s: jnp.where(
            reset.reshape((1, -1) + (1,) * (s.ndim - 2))
            if s.ndim > 1 else reset, z, s), zero, state)

    audio_cfg = cfg.asr.audio
    gate, silero_speech, lead, trail = _vad_stage(
        params, cfg, wave, audio_cfg.buffer_length, audio_cfg.sample_rate)
    decode = active & (contain_token | (gate & silero_speech))

    mel_cfg = (MelConfig.for_english() if rnnt.n_mels == 80
               else _tiny_en_mel(rnnt.n_mels))
    # global-stats normalization rides in the en_frontend params when the
    # reference's global_stats_rnnt.json is configured (en_global_stats)
    feats = log_mel(params["en_frontend"], mel_cfg, wave,
                    mean=params["en_frontend"].get("mean"),
                    invstddev=params["en_frontend"].get("invstddev"))
    # center=True yields one extra frame; trim to a multiple of the
    # reduction stride so the chunk reduces to segment + rc frames.
    em = rnnt.emformer
    want = (em.segment_length + em.right_context_length) * 4
    feats = feats[:, :want]

    out = rnnt_greedy_stream_step(params, rnnt, feats, state, active=decode)

    if emission_buf is not None:
        # Device-resident transcriber-encoding ring buffer (mirrors the
        # CTC emission buffer): lets the host RNNT beam rescore finals
        # without per-tick encoding transfers.
        B, U, E = out.encodings.shape
        max_t = emission_buf.shape[1]
        pos = jnp.clip(state.encoder.length, 0, max_t - max_t % U - U)
        rows = (_pack_f16_rows(out.encodings) if _emission_packed(cfg)
                else out.encodings.astype(emission_buf.dtype))
        emission_buf = _append(emission_buf, rows, pos, decode)

    pack = _pack(decode, gate, silero_speech, lead, trail,
                 out.tokens.astype(jnp.float32))
    return ServingTickOutput(pack=pack, state=out.state,
                             emission=emission_buf, ctx=new_ctx)


def serving_step_rnnt_beam(params: dict, cfg: ServingConfig,
                           segment_i16: jax.Array,
                           contain_token: jax.Array, active: jax.Array,
                           new_stream: jax.Array, reset: jax.Array,
                           state: BeamServingState, ctx: jax.Array,
                           emission_buf: Optional[jax.Array] = None
                           ) -> ServingTickOutput:
    """EN beam-partials tick: VAD + transcriber + device-batched beam.

    The scalable equivalent of the reference's production EN decode —
    torchaudio RNNTBeamSearch.infer on every chunk with a carried
    hypothesis (reference recognition.py:122-133, streaming_server.py:445)
    — with the beam as a device batch axis (models/rnnt_beam.py) instead
    of a host loop per stream.  The pack's data columns carry the best
    hypothesis per stream: [n_tokens, token_0..token_{CAP-1}] (f32 holds
    token ids <= 4096 exactly).
    """
    from asr_streaming_tpu.models.emformer import init_emformer_state
    from asr_streaming_tpu.models.rnnt import transcriber_step
    from asr_streaming_tpu.models.rnnt_beam import rnnt_beam_chunk_step

    wave, new_ctx = _assemble_wave(cfg, segment_i16, ctx, active,
                                   new_stream)
    rnnt = cfg.rnnt
    B = wave.shape[0]
    zero_enc = init_emformer_state(rnnt.emformer, B)
    enc_state = jax.tree.map(
        lambda z, s: jnp.where(
            reset.reshape((1, -1) + (1,) * (s.ndim - 2))
            if s.ndim > 1 else reset, z, s), zero_enc, state.encoder)

    audio_cfg = cfg.asr.audio
    gate, silero_speech, lead, trail = _vad_stage(
        params, cfg, wave, audio_cfg.buffer_length, audio_cfg.sample_rate)
    decode = active & (contain_token | (gate & silero_speech))

    mel_cfg = (MelConfig.for_english() if rnnt.n_mels == 80
               else _tiny_en_mel(rnnt.n_mels))
    feats = log_mel(params["en_frontend"], mel_cfg, wave,
                    mean=params["en_frontend"].get("mean"),
                    invstddev=params["en_frontend"].get("invstddev"))
    em = rnnt.emformer
    feats = feats[:, :(em.segment_length + em.right_context_length) * 4]

    enc, stepped = transcriber_step(params, rnnt, feats, enc_state)
    new_enc_state = jax.tree.map(
        lambda n, o: jnp.where(
            decode.reshape((1, -1) + (1,) * (n.ndim - 2))
            if n.ndim > 1 else decode, n, o), stepped, enc_state)

    beam_state, best_toks, best_len = rnnt_beam_chunk_step(
        params, rnnt, enc.astype(jnp.float32), state.beam,
        active=decode, reset=reset)

    if emission_buf is not None:
        # same device-resident encoding buffer as the greedy path (host
        # rescorers/evaluators can still fetch a segment's encodings)
        U = enc.shape[1]
        max_t = emission_buf.shape[1]
        pos = jnp.clip(enc_state.length, 0, max_t - max_t % U - U)
        rows = (_pack_f16_rows(enc) if _emission_packed(cfg)
                else enc.astype(emission_buf.dtype))
        emission_buf = _append(emission_buf, rows, pos, decode)

    data = jnp.concatenate(
        [best_len[:, None].astype(jnp.float32),
         best_toks.astype(jnp.float32)], axis=1)
    pack = _pack(decode, gate, silero_speech, lead, trail, data)
    return ServingTickOutput(
        pack=pack,
        state=BeamServingState(encoder=new_enc_state, beam=beam_state),
        emission=emission_buf, ctx=new_ctx)


def make_serving_step(cfg: ServingConfig):
    """Return the jit-able step function for this config's model kind."""
    if cfg.model_kind == "rnnt":
        if cfg.en_beam_width_device:
            return serving_step_rnnt_beam
        return serving_step_rnnt
    return serving_step
