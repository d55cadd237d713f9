"""Streaming Emformer-RNNT (English path), TPU-native.

Re-design of the reference's English model (reference: lightspeech/models/
recognition.py:96-133 — torchaudio ``emformer_rnnt_base(num_symbols=4097)``
+ ``RNNTBeamSearch(blank=4096)``; served at streaming_server.py:441-465):

  transcriber: mel(80) -> input_linear(80->128) -> time_reduction x4 (512)
               -> 20-layer streaming Emformer (segment 4, rc 1, lc 30,
               no memory) -> linear 512->1024 + LayerNorm
  predictor:   embedding(512) -> LSTM stack -> linear -> LayerNorm
  joiner:      ReLU(enc + pred) -> linear(V)

TPU-first decisions:
  * the transcriber step is the same fixed-shape masked Emformer used by
    the Vietnamese path (max_memory_size=0 path) — one compiled step for
    all streams;
  * greedy RNNT decode runs ON DEVICE, batched over streams: a
    lax.scan over frames with a bounded symbol-expansion inner loop and
    masked predictor-state updates (the reference's host-side torchaudio
    beam loop cannot batch across streams at all);
  * a host-side beam search (width 10, carried hypothesis like the
    reference) is provided for accuracy parity on finals.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.emformer import (
    EmformerConfig, EmformerState, emformer_stream_step,
    init_emformer_params, init_emformer_state, _linear_init, _layer_norm,
)
from asr_streaming_tpu.models.encoder import _time_reduction


@dataclasses.dataclass(frozen=True)
class RNNTConfig:
    n_mels: int = 80
    input_linear_dim: int = 128     # pre-reduction dim (x4 -> d_model)
    d_model: int = 512
    encoding_dim: int = 1024        # transcriber/predictor output dim
    vocab_size: int = 4097
    blank: int = 4096
    pred_embed_dim: int = 512
    pred_hidden: int = 512
    # torchaudio emformer_rnnt_base: num_lstm_layers=3 with layer-normed
    # custom LSTM cells (lstm_layer_norm=True, eps=1e-3) — the predictor
    # must match for checkpoint import (tools/convert_rnnt_checkpoint.py)
    pred_layers: int = 3
    lstm_layer_norm: bool = True
    lstm_ln_eps: float = 1e-3
    max_symbols_per_frame: int = 4
    emformer: EmformerConfig = dataclasses.field(
        default_factory=lambda: EmformerConfig(
            d_model=512, num_heads=8, ffn_dim=2048, num_layers=20,
            segment_length=4, left_context_length=30,
            right_context_length=1, max_memory_size=0, tanh_on_mem=True))

    @classmethod
    def tiny(cls, vocab_size: int = 32) -> "RNNTConfig":
        return cls(
            n_mels=16, input_linear_dim=16, d_model=64, encoding_dim=48,
            vocab_size=vocab_size, blank=vocab_size - 1, pred_embed_dim=24,
            pred_hidden=32, pred_layers=1,
            emformer=EmformerConfig(
                d_model=64, num_heads=4, ffn_dim=96, num_layers=2,
                segment_length=4, left_context_length=8,
                right_context_length=1, max_memory_size=0))


def transcriber_segment_frames(audio) -> int:
    """Emformer segment length (post x4 time-reduction frames) implied by
    an EN audio geometry: segment_size mel frames per chunk / stride 4.
    The reference's standard EN geometry (segment_size 16,
    asr-online.yaml:120-126) gives 4; the reduced variant (segment_size
    8, asr-online-en.yaml:68-74) gives 2."""
    return max(1, audio.segment_size // 4)


def rnnt_config_for_audio(base: "RNNTConfig", audio) -> "RNNTConfig":
    """Re-derive the transcriber's streaming segment from the serving
    audio geometry (keeps model and stream machine in lockstep when a
    config ships a non-default EN geometry, e.g. server-en-reduced.yaml)."""
    seg = transcriber_segment_frames(audio)
    if base.emformer.segment_length == seg:
        return base
    return dataclasses.replace(
        base, emformer=dataclasses.replace(base.emformer,
                                           segment_length=seg))


class PredictorState(NamedTuple):
    h: jax.Array   # [layers, B, H]
    c: jax.Array   # [layers, B, H]


class RNNTStreamState(NamedTuple):
    encoder: EmformerState
    predictor: PredictorState
    last_token: jax.Array   # [B] int32


def init_rnnt_params(key: jax.Array, cfg: RNNTConfig) -> dict:
    ks = jax.random.split(key, 10)
    w_in, _ = _linear_init(ks[0], cfg.n_mels, cfg.input_linear_dim)
    w_out, b_out = _linear_init(ks[1], cfg.d_model, cfg.encoding_dim)

    # predictor LSTM stack (torchaudio _Predictor: embedding ->
    # input_layer_norm -> _CustomLSTM stack (x2g/p2g with g_norm/c_norm
    # when lstm_layer_norm) -> linear -> output_layer_norm)
    emb = jax.random.normal(ks[2], (cfg.vocab_size, cfg.pred_embed_dim)) \
        * (cfg.pred_embed_dim ** -0.5)
    lstms = []
    for i in range(cfg.pred_layers):
        k1, k2 = jax.random.split(ks[3 + i % 4])
        k1, k2 = jax.random.fold_in(k1, i), jax.random.fold_in(k2, i)
        in_dim = cfg.pred_embed_dim if i == 0 else cfg.pred_hidden
        wi, bi = _linear_init(k1, in_dim, 4 * cfg.pred_hidden)
        wh, bh = _linear_init(k2, cfg.pred_hidden, 4 * cfg.pred_hidden)
        lstms.append({
            "wi": wi, "bi": bi, "wh": wh, "bh": bh,
            "g_scale": jnp.ones(4 * cfg.pred_hidden),
            "g_bias": jnp.zeros(4 * cfg.pred_hidden),
            "c_scale": jnp.ones(cfg.pred_hidden),
            "c_bias": jnp.zeros(cfg.pred_hidden),
        })
    w_pred, b_pred = _linear_init(ks[7], cfg.pred_hidden, cfg.encoding_dim)
    w_joint, b_joint = _linear_init(ks[8], cfg.encoding_dim, cfg.vocab_size)

    return {
        "input_linear": {"w": w_in},
        "emformer": init_emformer_params(ks[9], cfg.emformer),
        "enc_out": {"w": w_out, "b": b_out,
                    "ln_scale": jnp.ones(cfg.encoding_dim),
                    "ln_bias": jnp.zeros(cfg.encoding_dim)},
        "predictor": {
            "embedding": emb,
            "input_ln_scale": jnp.ones(cfg.pred_embed_dim),
            "input_ln_bias": jnp.zeros(cfg.pred_embed_dim),
            "lstm": jax.tree.map(lambda *xs: jnp.stack(xs), *lstms),
            "out_w": w_pred, "out_b": b_pred,
            "ln_scale": jnp.ones(cfg.encoding_dim),
            "ln_bias": jnp.zeros(cfg.encoding_dim),
        },
        "joiner": {"w": w_joint, "b": b_joint},
    }


def init_rnnt_state(cfg: RNNTConfig, batch_size: int) -> RNNTStreamState:
    """Fresh stream state.  ``predictor`` holds the LSTM state from
    BEFORE consuming ``last_token`` (zeros before the BOS blank) — see
    rnnt_greedy_stream_step for why the before-consume convention is the
    one that survives chunk boundaries."""
    return RNNTStreamState(
        encoder=init_emformer_state(cfg.emformer, batch_size),
        predictor=PredictorState(
            h=jnp.zeros((cfg.pred_layers, batch_size, cfg.pred_hidden)),
            c=jnp.zeros((cfg.pred_layers, batch_size, cfg.pred_hidden))),
        last_token=jnp.full((batch_size,), cfg.blank, jnp.int32),
    )


# ---------------------------------------------------------------- components

def transcriber_step(params: dict, cfg: RNNTConfig, feats: jax.Array,
                     state: EmformerState
                     ) -> Tuple[jax.Array, EmformerState]:
    """feats: [B, T_mel, n_mels] reducing to segment+rc frames.
    Returns (encodings [B, segment, encoding_dim], state)."""
    x = feats @ params["input_linear"]["w"]
    x = _time_reduction(x, 4)
    em = cfg.emformer
    assert x.shape[1] == em.segment_length + em.right_context_length, \
        x.shape
    enc, new_state = emformer_stream_step(params["emformer"], em, x, state)
    p = params["enc_out"]
    enc = _layer_norm(enc @ p["w"] + p["b"], p["ln_scale"], p["ln_bias"])
    return enc, new_state


def predictor_step(params: dict, tokens: jax.Array, state: PredictorState,
                   cfg: Optional[RNNTConfig] = None
                   ) -> Tuple[jax.Array, PredictorState]:
    """One predictor step (torchaudio _Predictor semantics, one timestep).

    tokens: [B] int32 -> (out [B, encoding_dim], state).

    torchaudio's _CustomLSTM cell (verified gate order i, f, g, o):
        gates = g_norm(x2g(x) + p2g(h))
        c     = sigmoid(f) * c + sigmoid(i) * tanh(g)
        c     = c_norm(c)          # the CARRIED cell is the normed one
        h     = sigmoid(o) * tanh(c)
    x2g/p2g carry no bias when layer_norm is on (the converter zeros
    bi/bh); eps = lstm_ln_eps (1e-3 in emformer_rnnt_base).
    """
    use_ln = cfg is None or cfg.lstm_layer_norm
    eps = 1e-3 if cfg is None else cfg.lstm_ln_eps
    p = params["predictor"]
    x = p["embedding"][tokens]
    x = _layer_norm(x, p["input_ln_scale"], p["input_ln_bias"])
    hs, cs = [], []
    for i in range(state.h.shape[0]):
        lp = jax.tree.map(lambda a, i=i: a[i], p["lstm"])
        gates = x @ lp["wi"] + lp["bi"] + state.h[i] @ lp["wh"] + lp["bh"]
        if use_ln:
            gates = _layer_norm(gates, lp["g_scale"], lp["g_bias"], eps=eps)
        ii, ff, gg, oo = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(ff) * state.c[i] + \
            jax.nn.sigmoid(ii) * jnp.tanh(gg)
        if use_ln:
            c = _layer_norm(c, lp["c_scale"], lp["c_bias"], eps=eps)
        h = jax.nn.sigmoid(oo) * jnp.tanh(c)
        hs.append(h)
        cs.append(c)
        x = h
    out = _layer_norm(x @ p["out_w"] + p["out_b"], p["ln_scale"],
                      p["ln_bias"])
    return out, PredictorState(h=jnp.stack(hs), c=jnp.stack(cs))


def joiner(params: dict, enc: jax.Array, pred: jax.Array) -> jax.Array:
    """ReLU(enc + pred) @ W -> logits (torchaudio joiner semantics)."""
    return jax.nn.relu(enc + pred) @ params["joiner"]["w"] + \
        params["joiner"]["b"]


# ---------------------------------------------------- device greedy decoding

class GreedyChunkOutput(NamedTuple):
    tokens: jax.Array     # [B, segment * max_symbols] int32 (blank = none)
    n_emitted: jax.Array  # [B] int32
    encodings: jax.Array  # [B, segment, encoding_dim] transcriber outputs
    state: RNNTStreamState


def rnnt_greedy_stream_step(params: dict, cfg: RNNTConfig, feats: jax.Array,
                            state: RNNTStreamState,
                            active: Optional[jax.Array] = None
                            ) -> GreedyChunkOutput:
    """Batched greedy RNNT decode of one chunk, fully on device.

    Per frame: up to max_symbols_per_frame expansions; a stream whose
    argmax is blank stops expanding (masked updates keep shapes static).
    """
    B = feats.shape[0]
    K = cfg.max_symbols_per_frame
    if active is None:
        active = jnp.ones((B,), bool)

    enc, enc_state = transcriber_step(params, cfg, feats, state.encoder)
    # Predictor-state convention: state.predictor is the LSTM state from
    # BEFORE consuming state.last_token (zeros before the BOS blank), so
    # re-consuming last_token here reproduces the exact predictor output
    # the previous chunk's final emission saw — the joiner is conditioned
    # on [..., last] exactly once (training's predictor_forward teacher
    # forcing, and torchaudio's hypo carry which caches (state, out)).
    # Storing the AFTER-consume state and re-consuming on the next chunk
    # would condition on [..., last, last]: emissions then die after the
    # first chunk that produced a token (regression-tested in
    # tests/test_rnnt.py::test_greedy_cross_chunk_matches_oracle).
    pred_out0, pred_next0 = predictor_step(params, state.last_token,
                                           state.predictor)

    def frame_body(carry, enc_t):
        pred_next, pred_stored, last_token, pred_out = carry
        toks = jnp.full((B, K), cfg.blank, jnp.int32)

        def expand(k, inner):
            pred_next, pred_stored, last_token, pred_out, toks, alive = \
                inner
            logits = joiner(params, enc_t, pred_out)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = alive & (tok != cfg.blank) & active
            toks = toks.at[:, k].set(jnp.where(emit, tok, cfg.blank))
            # consume the new token from the after-everything state;
            # remember that state as the new "before-last" for emitters
            new_pred_out, new_next = predictor_step(
                params, jnp.where(emit, tok, last_token), pred_next)
            pred_stored = PredictorState(
                h=jnp.where(emit[None, :, None], pred_next.h,
                            pred_stored.h),
                c=jnp.where(emit[None, :, None], pred_next.c,
                            pred_stored.c))
            pred_next = PredictorState(
                h=jnp.where(emit[None, :, None], new_next.h, pred_next.h),
                c=jnp.where(emit[None, :, None], new_next.c, pred_next.c))
            pred_out = jnp.where(emit[:, None], new_pred_out, pred_out)
            last_token = jnp.where(emit, tok, last_token)
            return pred_next, pred_stored, last_token, pred_out, toks, emit

        pred_next, pred_stored, last_token, pred_out, toks, _ = \
            jax.lax.fori_loop(
                0, K, expand,
                (pred_next, pred_stored, last_token, pred_out, toks,
                 jnp.ones((B,), bool)))
        return (pred_next, pred_stored, last_token, pred_out), toks

    (_, pred_state, last_token, _), toks = jax.lax.scan(
        frame_body,
        (pred_next0, state.predictor, state.last_token, pred_out0),
        enc.transpose(1, 0, 2))

    tokens = toks.transpose(1, 0, 2).reshape(B, -1)       # [B, U*K]
    n_emitted = jnp.sum(tokens != cfg.blank, axis=1)

    # inactive streams keep their old state
    new_state = RNNTStreamState(
        encoder=jax.tree.map(
            lambda n, o: jnp.where(
                active.reshape((1, -1) + (1,) * (n.ndim - 2))
                if n.ndim > 1 else active, n, o),
            enc_state, state.encoder),
        predictor=PredictorState(
            h=jnp.where(active[None, :, None], pred_state.h,
                        state.predictor.h),
            c=jnp.where(active[None, :, None], pred_state.c,
                        state.predictor.c)),
        last_token=jnp.where(active, last_token, state.last_token),
    )
    return GreedyChunkOutput(tokens=tokens, n_emitted=n_emitted,
                             encodings=enc, state=new_state)


@jax.jit
def _jit_predictor_step(params, tokens, state):
    return predictor_step(params, tokens, state)


@jax.jit
def _jit_joiner_logp(params, enc, pred):
    return jax.nn.log_softmax(joiner(params, enc, pred), axis=-1)


# ------------------------------------------------------- host beam decoding

@dataclasses.dataclass
class Hypothesis:
    tokens: List[int]
    score: float
    pred_state: Any       # PredictorState with B=1
    pred_out: np.ndarray  # [encoding_dim]


class RNNTBeamDecoder:
    """Host-side beam search (width 10 like the reference's
    RNNTBeamSearch; carries the hypothesis across chunks the way
    streaming_server.py:445 does)."""

    def __init__(self, params: dict, cfg: RNNTConfig, beam_width: int = 10):
        self.params = params
        self.cfg = cfg
        self.beam_width = beam_width
        # params as explicit jit args (closure-captured arrays get
        # serialized into remote compile requests)
        self._pred = partial(_jit_predictor_step, params)
        self._join = partial(_jit_joiner_logp, params)

    def init_hypothesis(self) -> Hypothesis:
        state = PredictorState(
            h=jnp.zeros((self.cfg.pred_layers, 1, self.cfg.pred_hidden)),
            c=jnp.zeros((self.cfg.pred_layers, 1, self.cfg.pred_hidden)))
        out, state = self._pred(
            jnp.asarray([self.cfg.blank], jnp.int32), state)
        return Hypothesis(tokens=[], score=0.0, pred_state=state,
                          pred_out=np.asarray(out[0]))

    def step_chunk(self, encodings: np.ndarray,
                   hypos: Optional[List[Hypothesis]] = None
                   ) -> List[Hypothesis]:
        """Advance the beam over one chunk's encodings [U, D]."""
        if not hypos:
            hypos = [self.init_hypothesis()]
        cfg = self.cfg
        for t in range(encodings.shape[0]):
            enc_t = jnp.asarray(encodings[t])[None]
            finished: List[Hypothesis] = []
            active = list(hypos)
            for _ in range(cfg.max_symbols_per_frame + 1):
                if not active:
                    break
                scored = []
                for h in active:
                    logp = np.asarray(
                        self._join(enc_t, jnp.asarray(h.pred_out)[None])[0])
                    # blank: hypothesis moves to the next frame
                    finished.append(Hypothesis(
                        h.tokens, h.score + float(logp[cfg.blank]),
                        h.pred_state, h.pred_out))
                    # beam width can exceed the vocab (tiny test configs)
                    k = min(self.beam_width, len(logp))
                    top = np.argpartition(logp, -k)[-k:]
                    for tok in top:
                        tok = int(tok)
                        if tok == cfg.blank:
                            continue
                        scored.append((h.score + float(logp[tok]), h, tok))
                scored.sort(key=lambda x: -x[0])
                best_finished = max(h.score for h in finished)
                expanded = []
                for score, h, tok in scored[:self.beam_width]:
                    if score < best_finished - 10.0:
                        continue
                    out, st = self._pred(jnp.asarray([tok], jnp.int32),
                                         h.pred_state)
                    expanded.append(Hypothesis(
                        h.tokens + [tok], score, st, np.asarray(out[0])))
                active = expanded
            finished.sort(key=lambda h: -h.score)
            # dedupe by token sequence, keep best
            seen, hypos = set(), []
            for h in finished:
                key = tuple(h.tokens)
                if key not in seen:
                    seen.add(key)
                    hypos.append(h)
                if len(hypos) >= self.beam_width:
                    break
        return hypos


def make_rnnt_rescorer(params: dict, cfg: RNNTConfig,
                       pieces: Sequence[str], beam_width: int = 10):
    """FinalSegment -> transcript via beam search over the segment's
    device-buffered transcriber encodings (the streaming path decodes
    greedily; finals get the beam like the reference's torchaudio
    RNNTBeamSearch quality, applied per segment)."""
    beam = RNNTBeamDecoder(params, cfg, beam_width=beam_width)

    def rescore(segment) -> str:
        enc = np.asarray(segment.emission[:segment.length], np.float32)
        if not len(enc):
            return ""
        hypos = beam.step_chunk(enc)
        return detokenize_pieces(hypos[0].tokens, pieces, lstrip=False)

    return rescore


def detokenize_pieces(tokens: Sequence[int], pieces: Sequence[str],
                      lstrip: bool = False) -> str:
    """SentencePiece-style detokenization (reference uses
    _SentencePieceTokenProcessor, recognition.py:119): pieces starting
    with '▁' begin a new word."""
    text = "".join(pieces[t] for t in tokens if 0 <= t < len(pieces))
    text = text.replace("▁", " ")
    return text.lstrip() if lstrip else text
