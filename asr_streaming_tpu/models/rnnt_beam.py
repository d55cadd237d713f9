"""Device-batched RNNT beam search: the beam as a batch axis.

The reference's ONLY English decode mode runs torchaudio's host-side
``RNNTBeamSearch.infer`` (beam width 10) on every chunk of every stream
(reference: lightspeech/models/recognition.py:122-133, invoked per chunk
at streaming_server.py:441-465) — a Python loop over hypotheses whose
every expansion is one predictor+joiner dispatch.  Replicating that
pattern host-side (models/rnnt.py::RNNTBeamDecoder, the parity oracle)
was measured at ~8.7 s/stream/chunk through a thin host link
(tools/ablate_en_beam.py): beam 10 x (max_symbols+1) x frames separate
device round trips per stream per chunk.

This module is the TPU-native redesign: ALL B streams x W hypotheses
advance together in ONE jitted chunk step.

  * hypotheses live on device as fixed-shape arrays [B, W, ...]: token
    buffer, rolling 64-bit hash (two int32 lanes) of the token sequence,
    log-prob score, predictor LSTM state, cached predictor output;
  * each frame runs (max_symbols+1) expansion rounds; every round is one
    batched joiner over [B, W, V] and one batched predictor over [B*W]
    (the MXU sees 5120-row matmuls instead of 1-row host dispatches);
  * blank-finished hypotheses are stacked per round; the end-of-frame
    top-W selection dedupes by sequence hash with score/order tie rules
    matching the host oracle's stable sort + first-seen-key dedupe;
  * the host receives only the best hypothesis's token buffer (riding
    the tick's single pack transfer) and detokenizes.

Semantics are pinned to the host oracle (models/rnnt.py::RNNTBeamDecoder,
itself golden-tested in tests/test_overfit_rnnt_e2e.py), including its
quirks: per-hypothesis top-W candidate preselection computed over the
FULL logp row (blank included, then dropped), and the
``best_finished - 10.0`` pruning threshold applied to the global top-W
slice only.  tests/test_rnnt_beam_device.py asserts equality chunk by
chunk, across segment resets, against that oracle.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.rnnt import (
    PredictorState, RNNTConfig, joiner, predictor_step,
)
from asr_streaming_tpu.ops.topk import iter_topk

# Scores are plain f32 log-probs; NEG marks dead beam slots.  Using a
# large-finite sentinel (not -inf) keeps every arithmetic path NaN-free:
# NEG + log_softmax(...) stays ~NEG, and (NEG >= NEG - 10) comparisons
# stay well-defined.  VALID_FLOOR separates "real hypothesis" from
# "sentinel arithmetic residue" (a dead slot's score only ever moves by
# adding logp <= 0, so it can never climb back above the floor).
NEG = -1.0e30
VALID_FLOOR = -1.0e29

# Rolling polynomial hash of the token sequence, two independent int32
# lanes (wraparound multiply is XLA's defined int32 behavior).  Equal
# sequences always collide (incremental update is order-exact); unequal
# sequences collide with ~2^-64 probability — the dedupe granularity the
# host oracle gets from tuple(tokens) keys.
_HASH_M1 = jnp.int32(1_000_003)
_HASH_M2 = jnp.int32(69_069)
_HASH_INIT1 = jnp.int32(17)
_HASH_INIT2 = jnp.int32(29)


class BeamState(NamedTuple):
    """Carried per-stream beam: W hypotheses per stream, slot 0 = best."""
    tokens: jax.Array    # [B, W, CAP] int32 token buffer (prefix valid)
    lengths: jax.Array   # [B, W] int32 valid token count
    scores: jax.Array    # [B, W] f32 log-prob (NEG = dead slot)
    h1: jax.Array        # [B, W] int32 rolling hash lane 1
    h2: jax.Array        # [B, W] int32 rolling hash lane 2
    pred_h: jax.Array    # [L, B, W, H] predictor LSTM hidden
    pred_c: jax.Array    # [L, B, W, H] predictor LSTM cell
    pred_out: jax.Array  # [B, W, D] cached predictor output (post-LN)


def init_beam_state(cfg: RNNTConfig, batch: int, width: int,
                    cap: int = 256) -> BeamState:
    """Zeros placeholder (every slot dead).  A stream's first tick always
    carries reset=True (the scheduler sets needs_reset at admit), and
    rnnt_beam_chunk_step materializes the real fresh beam — which needs
    the predictor params — in-graph for reset slots."""
    L, H, D = cfg.pred_layers, cfg.pred_hidden, cfg.encoding_dim
    return BeamState(
        tokens=jnp.zeros((batch, width, cap), jnp.int32),
        lengths=jnp.zeros((batch, width), jnp.int32),
        scores=jnp.full((batch, width), NEG, jnp.float32),
        h1=jnp.full((batch, width), _HASH_INIT1),
        h2=jnp.full((batch, width), _HASH_INIT2),
        pred_h=jnp.zeros((L, batch, width, H), jnp.float32),
        pred_c=jnp.zeros((L, batch, width, H), jnp.float32),
        pred_out=jnp.zeros((batch, width, D), jnp.float32),
    )


def _fresh_beam(params: dict, cfg: RNNTConfig, batch: int, width: int,
                cap: int) -> BeamState:
    """One live empty hypothesis in slot 0: score 0, predictor having
    consumed the BOS blank from zeros (host oracle init_hypothesis)."""
    L, H, D = cfg.pred_layers, cfg.pred_hidden, cfg.encoding_dim
    z = PredictorState(h=jnp.zeros((L, 1, H)), c=jnp.zeros((L, 1, H)))
    po, ps = predictor_step(
        params, jnp.full((1,), cfg.blank, jnp.int32), z, cfg)
    return BeamState(
        tokens=jnp.zeros((batch, width, cap), jnp.int32),
        lengths=jnp.zeros((batch, width), jnp.int32),
        scores=jnp.full((batch, width), NEG,
                        jnp.float32).at[:, 0].set(0.0),
        h1=jnp.full((batch, width), _HASH_INIT1),
        h2=jnp.full((batch, width), _HASH_INIT2),
        pred_h=jnp.broadcast_to(ps.h[:, 0][:, None, None, :],
                                (L, batch, width, H)),
        pred_c=jnp.broadcast_to(ps.c[:, 0][:, None, None, :],
                                (L, batch, width, H)),
        pred_out=jnp.broadcast_to(po[0], (batch, width, D)),
    )


def _where_stream(mask: jax.Array, new: BeamState,
                  old: BeamState) -> BeamState:
    """Per-stream select over the batch axis (axis 0 except pred_h/c's
    axis 1)."""
    m0 = mask
    return BeamState(
        tokens=jnp.where(m0[:, None, None], new.tokens, old.tokens),
        lengths=jnp.where(m0[:, None], new.lengths, old.lengths),
        scores=jnp.where(m0[:, None], new.scores, old.scores),
        h1=jnp.where(m0[:, None], new.h1, old.h1),
        h2=jnp.where(m0[:, None], new.h2, old.h2),
        pred_h=jnp.where(m0[None, :, None, None], new.pred_h, old.pred_h),
        pred_c=jnp.where(m0[None, :, None, None], new.pred_c, old.pred_c),
        pred_out=jnp.where(m0[:, None, None], new.pred_out, old.pred_out),
    )


def _beam_frame(params: dict, cfg: RNNTConfig, enc_t: jax.Array,
                bs: BeamState, threshold: float) -> BeamState:
    """Advance every stream's beam by one encoder frame.

    Mirrors the host oracle's frame loop exactly:
      for k in 0..K: every active hypothesis contributes a blank-finished
      entry; rounds k<K then expand the global top-W non-blank candidates
      (drawn from each hypothesis's top-W logp entries, blank dropped)
      that clear best_finished - threshold.  End of frame: stable-order
      dedupe by sequence, keep top W.
    """
    B, W = bs.scores.shape
    V = cfg.vocab_size
    K = cfg.max_symbols_per_frame
    L = bs.pred_h.shape[0]
    CAP = bs.tokens.shape[2]
    kcap = min(W, V)   # host: min(beam_width, len(logp)) preselection

    # Active set: within a frame, hypotheses are (entering slot `parent`)
    # + (the <=K tokens appended this frame, in `app`).  Full token
    # buffers are reconstructed only for the W end-of-frame survivors.
    act_score = bs.scores
    act_parent = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[None], (B, W))
    act_app = jnp.zeros((B, W, max(K, 1)), jnp.int32)
    act_h1, act_h2 = bs.h1, bs.h2
    act_ph, act_pc, act_po = bs.pred_h, bs.pred_c, bs.pred_out

    fin_score, fin_parent, fin_app = [], [], []
    fin_h1, fin_h2, fin_ph, fin_pc, fin_po = [], [], [], [], []
    run_max = jnp.full((B,), NEG)

    for k in range(K + 1):
        logits = joiner(params, enc_t[:, None, :], act_po)   # [B, W, V]
        logp = jax.nn.log_softmax(logits, axis=-1)

        # blank move: hypothesis finishes this frame as-is
        blank_sc = act_score + logp[..., cfg.blank]
        fin_score.append(blank_sc)
        fin_parent.append(act_parent)
        fin_app.append(act_app)
        fin_h1.append(act_h1)
        fin_h2.append(act_h2)
        fin_ph.append(act_ph)
        fin_pc.append(act_pc)
        fin_po.append(act_po)
        run_max = jnp.maximum(run_max, jnp.max(blank_sc, axis=1))
        if k == K:
            break

        # host parity: each hypothesis offers EXACTLY its top-kcap logp
        # entries — blank included in the ranking, then dropped as a
        # candidate, so a blank in the top-kcap consumes one slot.  That
        # is the oracle's own semantics (models/rnnt.py::step_chunk:
        # np.argpartition(logp, -k)[-k:], an exact-k selection whose tie
        # membership is arbitrary; iter_topk's ties -> lowest index is a
        # deterministic refinement).  NOTE: r4's device code used a
        # threshold mask (logp >= kcap-th value), which kept EXTRA
        # entries tying the boundary — tie-INCLUSIVE, which the oracle
        # never was; exact f32 logp ties at the kcap boundary are the
        # only inputs where the behaviors can differ, and this exact-k
        # form is the faithful one.
        #
        # The r4 two-pass shape (threshold-mask cand[B, W, V], flat
        # top-W over [B, W*V]) is collapsed to ONE row top-k plus a flat
        # top-W over the tiny [B, W*kcap] survivor table.  For exact-k
        # preselection this loses nothing: any flat winner must be
        # inside its row's top-kcap by the row order (if kcap row
        # entries beat it in row order — higher value, or equal value at
        # lower index — they also beat it in flat order), and both tie
        # orders agree (within a row, equal values sort by ascending
        # index in both spaces; across rows, by row).  The [B, W, V]
        # candidate tensor is never materialized and the wide flat pass
        # (3.6 ms at 512x10, NOTES_r5) disappears.  iter_topk ==
        # lax.top_k bit-for-bit (tests/test_topk.py) without the full
        # batched sort lax.top_k lowers to.  (A Pallas top-k kernel
        # exists — ops/pallas_topk.py — and is ~40% faster standalone,
        # but as a fusion BARRIER it doubled the measured frame cost
        # here: XLA fuses iter_topk's first block-max pass into the
        # joiner/log_softmax producers, which the kernel cannot.)
        row_v, row_i = iter_topk(logp, kcap)           # [B, W, kcap]
        cand_sm = act_score[..., None] + row_v
        cand_sm = jnp.where(row_i == cfg.blank, NEG, cand_sm)
        top_sc, flat = iter_topk(cand_sm.reshape(B, W * kcap), W)
        src = (flat // kcap).astype(jnp.int32)
        tok = jnp.take_along_axis(row_i.reshape(B, W * kcap), flat,
                                  axis=1).astype(jnp.int32)
        keep = (top_sc >= run_max[:, None] - threshold) & \
               (top_sc > VALID_FLOOR)
        act_score = jnp.where(keep, top_sc, NEG)

        take = lambda a: jnp.take_along_axis(a, src, axis=1)  # noqa: E731
        act_parent = take(act_parent)
        act_h1 = take(act_h1) * _HASH_M1 + (tok + 1)
        act_h2 = take(act_h2) * _HASH_M2 + (tok + 1)
        act_app = jnp.take_along_axis(act_app, src[..., None], axis=1)
        act_app = act_app.at[:, :, k].set(tok)
        src_lw = src[None, :, :, None]
        act_ph = jnp.take_along_axis(act_ph, src_lw, axis=2)
        act_pc = jnp.take_along_axis(act_pc, src_lw, axis=2)

        # consume the appended token (one batched predictor step)
        ps = PredictorState(h=act_ph.reshape(L, B * W, -1),
                            c=act_pc.reshape(L, B * W, -1))
        po, ps2 = predictor_step(params, tok.reshape(B * W), ps, cfg)
        act_po = po.reshape(B, W, -1)
        act_ph = ps2.h.reshape(L, B, W, -1)
        act_pc = ps2.c.reshape(L, B, W, -1)

    # ---- end of frame: dedupe finished by sequence, keep top W.
    # Finished index f = k*W + w matches the host's append order (round-
    # major, active order within a round), so the equal-score tie rule
    # "keep the earliest" reproduces the oracle's stable sort.
    F = (K + 1) * W
    fscore = jnp.stack(fin_score, axis=1).reshape(B, F)
    fh1 = jnp.stack(fin_h1, axis=1).reshape(B, F)
    fh2 = jnp.stack(fin_h2, axis=1).reshape(B, F)

    eq = (fh1[:, :, None] == fh1[:, None, :]) & \
         (fh2[:, :, None] == fh2[:, None, :])                 # [B, i, j]
    idx = jnp.arange(F, dtype=jnp.int32)
    s_i = fscore[:, :, None]
    s_j = fscore[:, None, :]
    better = (s_j > s_i) | ((s_j == s_i) &
                            (idx[None, :] < idx[:, None])[None])
    dup = jnp.any(eq & better, axis=2)
    fscore = jnp.where(dup, NEG, fscore)

    top_sc, top_f = jax.lax.top_k(fscore, W)                  # [B, W]
    n_app = (top_f // W).astype(jnp.int32)   # finished at round k: k appended
    gat = lambda lst: jnp.take_along_axis(                    # noqa: E731
        jnp.stack(lst, axis=1).reshape(B, F), top_f, axis=1)
    parent = gat(fin_parent)
    new_h1 = gat(fin_h1)
    new_h2 = gat(fin_h2)
    app = jnp.take_along_axis(
        jnp.stack(fin_app, axis=1).reshape(B, F, -1),
        top_f[..., None], axis=1)                             # [B, W, K]
    # Survivor predictor states: per-round masked gathers.  Stacking the
    # round lists first ([L, B, F, H] for h and c) materializes ~400 MB
    # per frame at 512x10 production shapes (NOTES_r4 §1); instead gather
    # each round's [L, B, W, H] block by the survivor's within-round
    # column and select by its round — the F-stacks never exist.
    col = (top_f % W).astype(jnp.int32)                       # [B, W]
    new_ph = new_pc = new_po = None
    for k in range(K + 1):
        g_ph = jnp.take_along_axis(fin_ph[k], col[None, :, :, None],
                                   axis=2)
        g_pc = jnp.take_along_axis(fin_pc[k], col[None, :, :, None],
                                   axis=2)
        g_po = jnp.take_along_axis(fin_po[k], col[..., None], axis=1)
        if k == 0:
            new_ph, new_pc, new_po = g_ph, g_pc, g_po
        else:
            in_k = (n_app == k)
            new_ph = jnp.where(in_k[None, :, :, None], g_ph, new_ph)
            new_pc = jnp.where(in_k[None, :, :, None], g_pc, new_pc)
            new_po = jnp.where(in_k[..., None], g_po, new_po)

    # token buffers: survivor = entering parent's buffer + appended run
    par_buf = jnp.take_along_axis(bs.tokens, parent[..., None], axis=1)
    par_len = jnp.take_along_axis(bs.lengths, parent, axis=1)
    pos = jnp.arange(CAP, dtype=jnp.int32)[None, None, :]
    new_buf = par_buf
    for j in range(K):
        write = ((j < n_app)[..., None] &
                 (pos == (par_len + j)[..., None]))  # overflow: never hits
        new_buf = jnp.where(write, app[:, :, j:j + 1], new_buf)
    new_len = jnp.minimum(par_len + n_app, CAP)

    return BeamState(tokens=new_buf, lengths=new_len, scores=top_sc,
                     h1=new_h1, h2=new_h2, pred_h=new_ph, pred_c=new_pc,
                     pred_out=new_po)


def rnnt_beam_chunk_step(params: dict, cfg: RNNTConfig, enc: jax.Array,
                         state: BeamState,
                         active: Optional[jax.Array] = None,
                         reset: Optional[jax.Array] = None,
                         threshold: float = 10.0
                         ) -> Tuple[BeamState, jax.Array, jax.Array]:
    """Advance all streams' beams over one chunk's encodings.

    Args:
      enc: [B, U, D] transcriber encodings for this chunk.
      active: [B] bool — advance this stream (False = hold state).
      reset: [B] bool — fresh beam before the chunk (segment start).

    Returns (state, best_tokens [B, CAP] int32, best_len [B] int32) —
    the best hypothesis's full token sequence per stream (beam slot 0).
    """
    B, U, _ = enc.shape
    W = state.scores.shape[1]
    CAP = state.tokens.shape[2]
    if reset is not None:
        state = _where_stream(reset, _fresh_beam(params, cfg, B, W, CAP),
                              state)

    def frame_body(bs, enc_t):
        return _beam_frame(params, cfg, enc_t, bs, threshold), None

    new_state, _ = jax.lax.scan(frame_body, state,
                                enc.transpose(1, 0, 2))
    if active is not None:
        new_state = _where_stream(active, new_state, state)
    return new_state, new_state.tokens[:, 0], new_state.lengths[:, 0]
