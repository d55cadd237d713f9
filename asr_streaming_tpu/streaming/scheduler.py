"""Continuous-batching scheduler: N streams -> one fixed-shape TPU step/tick.

The idiomatic TPU replacement for both the reference's inline
per-connection pipeline (reference: streaming_decoder/streaming_server.py:
371-572) and its v1 multi-stream batching engine (streaming_decoder_v1/
streaming_asr.py:16-119): streams occupy fixed slots in a [max_slots, ...]
device-resident state; every tick gathers at most one ready chunk per
stream, runs ONE jitted serving step, and scatters per-stream events back.
Slot count is static, so there is exactly one XLA compilation for the
lifetime of the server no matter how streams churn (the failure mode the
reference's TorchScript notes warn about, streaming_server.py:666-681).

The scheduler is transport-agnostic: the websocket server feeds
``accept_waveform`` and consumes ``StreamEvent``s; final segments carry the
accumulated emission for the host-side beam rescorer.
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import deque
from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.serving import (
    PACK_DATA, PACK_DECODED, PACK_LEAD, PACK_TRAIL, ServingConfig,
    _emission_packed, _unpack_f16_rows, emission_width,
    init_audio_context, init_emission_buffer, init_serving_state,
    make_emission_fetcher, make_serving_step,
)
from asr_streaming_tpu.models.rnnt import detokenize_pieces
from asr_streaming_tpu.streaming.stream import Stream, FinalSegment
from asr_streaming_tpu.streaming.endpoint import NgramEndpointCost
from asr_streaming_tpu.utils.audio import AudioConfig


@dataclasses.dataclass
class StreamEvent:
    """One event to deliver to a client."""
    stream_id: str
    kind: str                   # "partial" | "final"
    text: str = ""
    is_final: bool = False
    segment: Optional[FinalSegment] = None
    utterance_seconds: float = 0.0
    stream: Optional[Stream] = None
    # perf_counter timestamp of the device dispatch that produced this
    # event (0.0 when unavailable) — lets harnesses split per-chunk
    # latency into scheduling wait vs device service (bench.py
    # link-decomposition artifact)
    dispatched_at: float = 0.0


def _apply_beam_cfg(cfg: ServingConfig, en_beam_partials: bool,
                    en_beam_width: int, en_beam_impl: str) -> ServingConfig:
    """Resolve the EN beam-partials mode into the ServingConfig: the
    device implementation changes the compiled step (models/serving.py
    serving_step_rnnt_beam) and the pack width, so the transformation
    must happen before ANY consumer of cfg (device state, emission
    buffer, worker client) is built."""
    if (en_beam_partials and en_beam_impl == "device"
            and cfg.model_kind == "rnnt" and not cfg.en_beam_width_device):
        return dataclasses.replace(cfg, en_beam_width_device=en_beam_width)
    return cfg


class Scheduler:
    def __init__(self, params: dict, cfg: ServingConfig,
                 vocab: Sequence[str], max_slots: int = 8,
                 language: str = "vi",
                 rules: Optional[dict] = None,
                 ngram_cost: Optional[NgramEndpointCost] = None,
                 rulesets: Optional[dict] = None,
                 mapping_rule: Optional[dict] = None,
                 donate_state: bool = True,
                 en_beam_partials: bool = False,
                 en_beam_width: int = 10,
                 en_beam_impl: str = "device",
                 pipeline_depth: int = 1,
                 mesh=None,
                 device_worker: Optional[dict] = None,
                 worker=None):
        cfg = _apply_beam_cfg(cfg, en_beam_partials, en_beam_width,
                              en_beam_impl)
        # Params are EXPLICIT jit args every dispatch (donation /
        # compile-size design, see _step below); host numpy checkpoint
        # params would re-upload every weight per tick — commit once
        # (utils/checkpoint.commit_params_to_device has the full story).
        if worker is None and device_worker is None:
            from asr_streaming_tpu.utils.checkpoint import (
                commit_params_to_device,
            )
            params = commit_params_to_device(params, mesh)
        self.params = params
        self.cfg = cfg
        self.vocab = list(vocab)
        self.max_slots = max_slots
        self.language = language
        self.rules = rules
        self.ngram_cost = ngram_cost
        self.rulesets = rulesets
        self.mapping_rule = mapping_rule

        # EN opt-in: run the carried-hypothesis beam search on EVERY
        # chunk (the reference's pattern, streaming_server.py:445) instead
        # of device-greedy partials + beam-rescored finals.  Unlike the
        # reference — which appends token_processor(full hypothesis
        # tokens) each chunk, duplicating text (stream.py:117 +
        # recognition.py:133 return cumulative tokens) — partials here are
        # true deltas of the best hypothesis's text.
        self.en_beam_partials = en_beam_partials and cfg.model_kind == "rnnt"
        # device impl (default): the beam rides the fused serving step
        # (cfg.en_beam_width_device set above); the pack's data columns
        # carry [n_tokens, tokens...] and _scatter only detokenizes.
        # host impl (en_beam_impl="host"): the original per-stream oracle
        # loop — kept as the parity reference (tools/ablate_en_beam.py
        # measures both).
        self._beam_device = bool(cfg.en_beam_width_device)
        self._beam = None
        self._fetch_chunk = None
        if self.en_beam_partials and not self._beam_device:
            from asr_streaming_tpu.models.rnnt import RNNTBeamDecoder
            self._beam = RNNTBeamDecoder(params, cfg.rnnt,
                                         beam_width=en_beam_width)
            U = cfg.rnnt.emformer.segment_length
            packed = _emission_packed(cfg)
            width = emission_width(cfg)

            @jax.jit
            def fetch_raw(buf, slot, pos):
                return jax.lax.dynamic_slice(
                    buf, (slot, pos, 0),
                    (1, U, buf.shape[2]))[0].astype(jnp.float32)

            def fetch_chunk(buf, slot, pos):
                out = np.asarray(fetch_raw(buf, slot, pos))
                return _unpack_f16_rows(out, width) if packed else out

            self._fetch_chunk = fetch_chunk

        # Device-process isolation (streaming/device_worker.py): the
        # serving step runs in a spawned child; staging buffers are its
        # shared memory, and this Scheduler keeps only the host half.
        self.worker = worker       # pre-built client / group view
        if device_worker is not None and worker is None:
            from asr_streaming_tpu.streaming.device_worker import (
                DeviceWorkerClient,
            )
            self.worker = DeviceWorkerClient(
                cfg, max_slots, pipeline_depth=pipeline_depth,
                **device_worker)
        if self.worker is not None:
            if mesh is not None:
                raise ValueError(
                    "device_worker and mesh are exclusive: the worker "
                    "child owns the device(s); use data_parallel without "
                    "device_worker, or device_worker alone")
            if self.en_beam_partials and not self._beam_device:
                raise ValueError(
                    "en_beam_partials host impl needs in-process device "
                    "access; use en_beam_impl='device' (default) for "
                    "device_worker mode")

        self.is_rnnt = cfg.model_kind == "rnnt"
        if self.worker is None:
            self.device_state = init_serving_state(cfg, max_slots)
            self.emission_buf = init_emission_buffer(cfg, max_slots)
            self._fetch_emission = make_emission_fetcher(cfg)
        else:
            self.device_state = None
            self.emission_buf = None
            self._fetch_emission = \
                lambda _buf, slot, ln: self.worker.fetch_emission(slot, ln)
        self.streams: Dict[int, Stream] = {}     # slot -> stream
        self._free = list(range(max_slots))[::-1]
        self._needs_reset = np.zeros(max_slots, bool)
        self._new_stream = np.zeros(max_slots, bool)
        # only NEW audio crosses the host link (int16); the carried
        # context prefix lives on device (init_audio_context).
        # depth+1 staging buffers: the async H2D copy of an in-flight
        # batch may still be reading its buffer while later ticks stage
        self._mulaw = cfg.upload_encoding == "mulaw"
        seg_dtype = np.uint8 if self._mulaw else np.int16
        self._segment = self.worker.staging if self.worker is not None \
            else np.zeros(
            (max(1, pipeline_depth) + 1, max_slots,
             cfg.asr.audio.segment_length), seg_dtype)
        self._staging_idx = 0
        self._seg_f32 = np.zeros((max_slots, cfg.asr.audio.segment_length),
                                 np.float32)
        # In-flight batches: each tick dispatches one and harvests the
        # oldest.  Depth 1 (default): gather batch N first (its upload
        # overlaps the harvest block of N-1), harvest, dispatch — every
        # ready stream rides every tick.  Depth >= 2 serializes each
        # stream's chunks through the pipeline (skips streams with
        # in-flight chunks) — only pays off when the per-tick round trip
        # is tiny relative to the device step (local PCIe hosts); on this
        # remote tunnel depth 1 measures fastest (1824 vs 1223 streams).
        self.pipeline_depth = max(1, pipeline_depth)
        self._pending: deque = deque()   # (out, ready, t_dispatch, fut)
        self.pending_slots: set = set()
        # Async harvest: the blocking device->host pack read runs on a
        # dedicated thread, submitted at dispatch.  The remote tunnel's
        # one-shot step latency is ~52 ms while its pipelined throughput
        # is ~22 ms/step (measured, NOTES_r2.md) — with the read
        # off-thread, OTHER groups' ticks (GroupedScheduler) proceed
        # while this group's result is still in flight, so the tunnel
        # pipeline stays full instead of ping-ponging one round trip per
        # tick.  Plain threads are safe with device work on this backend
        # (asyncio loops are not — see device_worker.py notes).
        self._async_harvest = not os.environ.get("ASR_NO_ASYNC_HARVEST")
        self._harvest_pool = None
        self.audio_ctx = init_audio_context(cfg, max_slots) \
            if self.worker is None else None

        # donate the carried device state + context + emission buffer.
        # params are an explicit argument (NOT a closure capture): captured
        # arrays are serialized into the remote compile request, which
        # overflows the axon tunnel's body limit (HTTP 413) at EN scale.
        self.mesh = mesh
        if self.worker is not None:
            self._step = None
        elif mesh is not None:
            # Multi-chip data-parallel serving: slots sharded over the
            # mesh's 'data' axis, one shard_map step per tick, zero
            # per-tick collectives (parallel/serving.py).
            from asr_streaming_tpu.parallel.serving import (
                data_parallel_size, make_sharded_stepper,
                shard_serving_arrays,
            )
            assert max_slots % data_parallel_size(mesh) == 0, (
                max_slots, dict(mesh.shape))
            self._step = make_sharded_stepper(cfg, mesh, params,
                                              donate_state=donate_state)
            self.device_state, self.audio_ctx, self.emission_buf = \
                shard_serving_arrays(cfg, mesh, self.device_state,
                                     self.audio_ctx, self.emission_buf)
        else:
            donate = (6, 7, 8) if donate_state else ()
            step_fn = make_serving_step(cfg)

            def _stepper(params, segment, contain, active, new_stream,
                         reset, state, ctx, emission):
                return step_fn(params, cfg, segment, contain, active,
                               new_stream, reset, state, ctx, emission)

            self._step = jax.jit(_stepper, donate_argnums=donate)

        # per-tick timing telemetry
        from asr_streaming_tpu.utils.observability import StageTimers
        self.timers = StageTimers()
        self.last_tick_seconds = 0.0
        self.ticks = 0
        # harvest watchdog state (one lazy monitor thread; see tick())
        self._harvest_started = None
        self._watchdog_thread = None

    def _ensure_watchdog(self) -> None:
        if self._watchdog_thread is not None:
            return
        import logging
        import threading
        import weakref

        ref = weakref.ref(self)

        def monitor():
            warned = False
            while True:
                time.sleep(10.0)
                sched = ref()
                if sched is None:
                    return
                started = sched._harvest_started
                if started is not None and \
                        time.monotonic() - started > 60.0:
                    if not warned:
                        logging.getLogger(__name__).error(
                            "harvest blocked >60s — device result never "
                            "arrived (backend wedged?); see NOTES_r2.md "
                            "axon notes")
                        warned = True
                else:
                    warned = False

        self._watchdog_thread = threading.Thread(
            target=monitor, name="harvest-watchdog", daemon=True)
        self._watchdog_thread.start()

    def warmup(self) -> float:
        """Compile the serving step before accepting traffic (first XLA
        compile takes minutes at full scale; the reference likewise
        frontloads all model loading at server init,
        streaming_server.py:108-215).  Returns compile seconds."""
        if self.worker is not None:
            return self.worker.warmup()
        t0 = time.perf_counter()
        B = self.max_slots
        seg_dt = jnp.uint8 if self._mulaw else jnp.int16
        seg = jnp.zeros((B, self.cfg.asr.audio.segment_length), seg_dt)
        flags = jnp.zeros((B,), bool)
        out = self._run_step(seg, flags, flags, flags, flags)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    def close(self) -> None:
        """Shut down the device worker (no-op for in-process mode)."""
        if self._harvest_pool is not None:
            self._harvest_pool.shutdown(wait=True)
            self._harvest_pool = None
        if self.worker is not None:
            self.worker.close()

    def _run_step(self, segment, contain, active, new_stream, reset):
        out = self._step(self.params, segment, contain, active, new_stream,
                         reset, self.device_state, self.audio_ctx,
                         self.emission_buf)
        self.emission_buf = out.emission
        self.device_state = out.state
        self.audio_ctx = out.ctx
        return out

    # ------------------------------------------------------------- lifecycle

    @property
    def num_active(self) -> int:
        return len(self.streams)

    def admit(self, stream_id: str) -> Optional[Stream]:
        """Allocate a slot; None if the server is full (admission control,
        reference streaming_server.py:238-247)."""
        if not self._free:
            return None
        slot = self._free.pop()
        stream = Stream(self.cfg.asr.audio, self.vocab,
                        language=self.language, rules=self.rules,
                        ngram_cost=self.ngram_cost, stream_id=stream_id,
                        keep_emission=False,  # emissions live on device
                        rulesets=self.rulesets,
                        mapping_rule=self.mapping_rule)
        stream._slot = slot
        self.streams[slot] = stream
        self._needs_reset[slot] = True
        self._new_stream[slot] = True   # zero the device audio context
        return stream

    def release(self, stream: Stream) -> None:
        slot = stream._slot
        if self.streams.get(slot) is stream:
            del self.streams[slot]
            self._needs_reset[slot] = True
            self._free.append(slot)

    # ------------------------------------------------------------------ tick

    def has_work(self) -> bool:
        return bool(self._pending) or \
            any(s.has_chunk() for s in self.streams.values())

    def harvest_ready(self) -> bool:
        """True when the OLDEST in-flight batch's result is already
        host-side — a tick now surfaces its events without blocking
        (used by GroupedScheduler to prioritize event delivery)."""
        if not self._pending:
            return False
        out_prev, _, _, fut = self._pending[0]
        if fut is not None:
            return fut.done()
        if out_prev is not None:
            try:
                return bool(out_prev.pack.is_ready())
            except Exception:
                return False
        return False

    def tick(self) -> List[StreamEvent]:
        """One pipelined scheduler cycle.

        Three phases, ordered so the device step never sits on the
        tick's critical path:
          1. harvest the OLDEST in-flight batch — when the pipeline is
             `pipeline_depth` deep, when its result is already host-side
             (non-blocking is_ready probe + async D2H started at
             dispatch), or when there is nothing new to gather — and
             scatter it to the stream state machines (settling
             contain_token / reset flags exactly as the reference's
             sequential per-chunk loop would);
          2. gather ready segments from streams with NO chunk still in
             flight (a stream's chunks are serialized through the
             pipeline so its flags are always settled), encode
             (native C++ codec), start the async host->device copy;
          3. dispatch the new batch.
        A chunk's events surface one tick after its gather (depth 1).
        """
        t0 = time.perf_counter()

        # ---- phase 1: gather + encode + async upload.
        # Depth 1 (default): gather EVERY ready stream — flags are read
        # at dispatch, which happens after this tick's harvest applies
        # the previous batch, so a stream's flags are always settled.
        # Depth >= 2: a stream's previous chunk may still be un-harvested
        # at dispatch time, so streams with in-flight chunks are skipped
        # (chunks serialize through the pipeline).
        t_gather = time.perf_counter()
        if self.pipeline_depth == 1:
            ready = [(slot, s) for slot, s in self.streams.items()
                     if s.has_chunk()]
        else:
            ready = [(slot, s) for slot, s in self.streams.items()
                     if s.has_chunk() and slot not in self.pending_slots]
        seg_dev = None
        staged_idx = self._staging_idx
        if ready:
            staging = self._segment[self._staging_idx]
            self._staging_idx = (self._staging_idx + 1) % len(self._segment)
            from asr_streaming_tpu.utils import codec_native
            if (codec_native.gather_available()
                    and not os.environ.get("ASR_NO_FUSED_GATHER")):
                # fused native path: encode each ready stream's segment
                # VIEW straight into its staging row — no Python copy
                # loop, no whole-matrix encode of idle rows
                views = []
                slots_arr = np.empty(len(ready), np.int32)
                for i, (slot, s) in enumerate(ready):
                    views.append(s.pop_chunk_view())
                    slots_arr[i] = slot
                codec_native.gather_encode_into(views, slots_arr, staging,
                                                self._mulaw)
                del views
            else:
                for slot, s in ready:
                    self._seg_f32[slot] = s.pop_chunk()
                # native single-pass encode (a few ms); numpy fallback is
                # bit-identical (models/serving.py mulaw LUT / int16 clip)
                if self._mulaw:
                    if not codec_native.mulaw_encode_into(self._seg_f32,
                                                          staging):
                        from asr_streaming_tpu.models.serving import \
                            mulaw_encode_host
                        staging[:] = mulaw_encode_host(self._seg_f32)
                else:
                    if not codec_native.pcm16_encode_into(self._seg_f32,
                                                          staging):
                        scaled = np.clip(self._seg_f32 * 32767.0,
                                         -32768, 32767)
                        staging[:] = scaled.astype(np.int16)
            # host-only share (scan + pop views + native encode): this
            # is the gather cost a local-PCIe host pays — the upload
            # DISPATCH below is timed separately because on the dev
            # tunnel it embeds link round-trip cost that a PCIe host's
            # transfer allowance already budgets (bench.py pcie_tick)
            self.timers.observe("gather_encode",
                                time.perf_counter() - t_gather)
            if self.worker is None:
                seg_dev = jnp.asarray(staging)   # async H2D copy starts
            else:
                self.worker.stage(staged_idx)    # child starts the H2D
            self.timers.observe("gather_upload",
                                time.perf_counter() - t_gather)

        # ---- phase 2: harvest the oldest in-flight batch (always at
        # depth 1 — its upload overlapped this tick's gather; at deeper
        # pipelines only once the queue is full or there is nothing new)
        events: List[StreamEvent] = []
        if self._pending and (len(self._pending) >= self.pipeline_depth
                              or not ready):
            out_prev, ready_prev, t_dispatch, fut = self._pending.popleft()
            # Harvest watchdog: a multi-minute block means the backend
            # lost the result (observed on the axon remote backend when
            # an asyncio event loop churns in the same process) — one
            # persistent monitor thread logs a diagnosis instead of a
            # silent stall (a per-tick Timer would spawn an OS thread on
            # the hot path).
            self._ensure_watchdog()
            self._harvest_started = time.monotonic()
            try:
                if fut is not None:
                    pack = fut.result()             # read started at dispatch
                elif self.worker is not None:
                    pack = self.worker.harvest()    # blocks until done
                else:
                    pack = np.asarray(out_prev.pack)  # blocks until done
            finally:
                self._harvest_started = None
            self.pending_slots = {slot for _, batch, _, _ in self._pending
                                  for slot, _ in batch}
            self.timers.observe("device_step",
                                time.perf_counter() - t_dispatch)
            events = self._scatter(pack, ready_prev,
                                   dispatched_at=t_dispatch)

        # ---- phase 3: dispatch the new batch
        if ready:
            B = self.max_slots
            active = np.zeros(B, bool)
            contain = np.zeros(B, bool)
            for slot, s in ready:
                active[slot] = True
                contain[slot] = s.is_contain_token
            t_dispatch = time.perf_counter()
            fut = None
            if self.worker is not None:
                self.worker.dispatch(staged_idx, contain, active,
                                     self._new_stream, self._needs_reset)
                out = None
                if self._async_harvest and self.worker.supports_pipelining:
                    fut = self.worker.harvest_async()
            else:
                out = self._run_step(
                    seg_dev, jnp.asarray(contain), jnp.asarray(active),
                    jnp.asarray(self._new_stream),
                    jnp.asarray(self._needs_reset))
                # start the pack's D2H now: by next tick the bytes are
                # already host-side and the harvest np.asarray is a local
                # copy instead of a device round trip on the critical path
                if not os.environ.get("ASR_NO_ASYNC_PACK"):
                    try:
                        out.pack.copy_to_host_async()
                    except AttributeError:
                        pass
                if self._async_harvest:
                    if self._harvest_pool is None:
                        from concurrent.futures import ThreadPoolExecutor
                        self._harvest_pool = ThreadPoolExecutor(
                            max_workers=1,
                            thread_name_prefix="pack-harvest")
                    fut = self._harvest_pool.submit(np.asarray, out.pack)
            self._needs_reset[:] = False
            self._new_stream[:] = False
            self._pending.append((out, ready, t_dispatch, fut))
            self.pending_slots |= {slot for slot, _ in ready}

        self.ticks += 1
        self.last_tick_seconds = time.perf_counter() - t0
        self.timers.observe("tick", self.last_tick_seconds)
        return events

    def _scatter(self, pack: np.ndarray, ready,
                 dispatched_at: float = 0.0) -> List[StreamEvent]:
        t_host = time.perf_counter()
        decoded = pack[:, PACK_DECODED] > 0.5
        lead = pack[:, PACK_LEAD]
        trail = pack[:, PACK_TRAIL]
        data = pack[:, PACK_DATA:].astype(np.int32)   # argmax / rnnt tokens
        if self.is_rnnt:
            blank = self.cfg.rnnt.blank

        events: List[StreamEvent] = []
        partial_update = {}
        for slot, s in ready:
            if decoded[slot]:
                if self.is_rnnt:
                    U = self.cfg.rnnt.emformer.segment_length
                    if self.en_beam_partials and self._beam_device:
                        # device-batched beam (models/rnnt_beam.py): the
                        # pack's data columns carry the best hypothesis
                        # [n_tokens, tokens...]; the host only detokenizes
                        n = int(data[slot, 0])
                        toks = data[slot, 1:1 + n]
                        full = detokenize_pieces(
                            [int(t) for t in toks], self.vocab,
                            lstrip=False)
                        prev = s.transcript_internal
                        delta = (full[len(prev):]
                                 if full.startswith(prev) else full)
                        s.apply_decode_en(delta, trail[slot], lead[slot],
                                          enc_frames=U, full_text=full)
                        partial_update[slot] = full != prev
                    elif self.en_beam_partials:
                        # host-impl oracle: carried-hypothesis beam on
                        # every chunk over the device-buffered transcriber
                        # encodings (the reference's pattern,
                        # streaming_server.py:445)
                        enc = np.asarray(self._fetch_chunk(
                            self.emission_buf, jnp.int32(slot),
                            jnp.int32(s.emission_length)))
                        prev = s.transcript_internal
                        try:
                            s.hypotheses = self._beam.step_chunk(
                                enc, getattr(s, "hypotheses", None))
                            full = detokenize_pieces(
                                s.hypotheses[0].tokens, self.vocab,
                                lstrip=False)
                        except Exception:
                            # the reference's IndexError -> hypothesis
                            # reset (streaming_server.py:457-463)
                            s.hypotheses = None
                            full = prev
                        delta = (full[len(prev):]
                                 if full.startswith(prev) else full)
                        s.apply_decode_en(delta, trail[slot], lead[slot],
                                          enc_frames=U, full_text=full)
                        partial_update[slot] = full != prev
                    else:
                        toks = [int(t) for t in data[slot] if t != blank]
                        delta = detokenize_pieces(toks, self.vocab,
                                                  lstrip=False)
                        s.apply_decode_en(delta, trail[slot], lead[slot],
                                          enc_frames=U)
                        partial_update[slot] = bool(delta.strip())
                else:
                    s.apply_decode(data[slot])
                    partial_update[slot] = True
            else:
                s.skip_silence()

            is_final, utt_len = s.check_endpoint(advance=False)
            if is_final:
                self._needs_reset[slot] = True  # state_init on next tick
                if self.en_beam_partials and not self._beam_device:
                    # new segment starts a fresh hypothesis (the reference
                    # leaves this commented out, streaming_server.py:549,
                    # letting text accumulate across segments — a bug we
                    # do not replicate).  Device impl: needs_reset above
                    # re-initializes the on-device beam next tick.
                    s.hypotheses = None
                emission_len = s.emission_length
                seg = s.take_final_segment(utt_len)
                if emission_len > 0:
                    # fetch this segment's device buffer (CTC log-probs /
                    # RNNT encodings) before the slot resets and
                    # overwrites it
                    seg.emission = self._fetch_emission(
                        self.emission_buf, slot, emission_len)
                    seg.length = emission_len
                events.append(StreamEvent(
                    stream_id=s.id, kind="final", text=seg.transcript_greedy,
                    is_final=True, segment=seg, utterance_seconds=utt_len,
                    stream=s, dispatched_at=dispatched_at))
            elif decoded[slot] and partial_update.get(slot) and \
                    s.transcript_internal.strip():
                # (EN sends partials only on nonempty deltas — the
                # reference's is_update flag, streaming_server.py:447-450)
                events.append(StreamEvent(
                    stream_id=s.id, kind="partial",
                    text=s.transcript_internal, stream=s,
                    dispatched_at=dispatched_at))

        self.timers.observe("host_scatter", time.perf_counter() - t_host)
        self.timers.increment("chunks_processed", len(ready))
        # VAD routing observability: how many gathered chunks actually
        # ran the decode path vs were skipped as silence by the on-device
        # gate (decode = active & (contain | (gate & silero)),
        # models/serving.py) — the golden loop asserts skipped > 0 with
        # trained VAD weights
        self.timers.increment(
            "chunks_decoded",
            int(sum(1 for slot, _ in ready if decoded[slot])))
        self.timers.increment("finals",
                              sum(1 for e in events if e.is_final))
        return events

    def is_pending(self, stream: Stream) -> bool:
        """Is this stream's chunk in the in-flight (pipelined) batch?"""
        return getattr(stream, "_slot", None) in self.pending_slots

    def drain(self, max_ticks: int = 10_000) -> List[StreamEvent]:
        """Run ticks until no stream has a ready chunk."""
        events: List[StreamEvent] = []
        for _ in range(max_ticks):
            if not self.has_work():
                break
            events.extend(self.tick())
        return events


class GroupedScheduler:
    """N slot groups ticked round-robin: the latency-oriented serving mode.

    One monolithic tick moves EVERY stream's audio and blocks events for
    a full 512-slot cycle; per-chunk latency is ~2 ticks.  Splitting the
    slots into G independent groups (each its own device state + pipelined
    Scheduler, all sharing one compiled step shape) shrinks the unit of
    work: a chunk waits at most one small group-tick to be gathered and
    surfaces two group-ticks later, while the groups' host work and
    device steps interleave on the single chip.  Throughput is unchanged
    (same total device work per 0.64 s); p50 latency drops by ~G.

    The reference has no equivalent — its per-connection inline pipeline
    (streaming_server.py:371-572) serializes every stream through one
    event loop.
    """

    def __init__(self, params: dict, cfg: ServingConfig,
                 vocab: Sequence[str], max_slots: int = 512,
                 groups: int = 4, **kwargs):
        # resolve the EN beam mode BEFORE the shared worker client is
        # built (it sizes pack shm from cfg); Scheduler re-applies this
        # idempotently per group
        cfg = _apply_beam_cfg(cfg, kwargs.get("en_beam_partials", False),
                              kwargs.get("en_beam_width", 10),
                              kwargs.get("en_beam_impl", "device"))
        groups = max(1, min(groups, max_slots))
        per = -(-max_slots // groups)          # ceil; capacity >= max_slots
        mesh = kwargs.get("mesh")
        if mesh is not None:
            # each group's slots shard over the mesh's data axis; round
            # the group size up so any (groups, data_parallel) pair works
            dp = mesh.shape["data"]
            per = -(-per // dp) * dp
        device_worker = kwargs.pop("device_worker", None)
        if device_worker is None and kwargs.get("worker") is None:
            # commit host (numpy) params to device ONCE here — each group
            # Scheduler's own commit would otherwise upload its own copy
            # of the identical weights
            from asr_streaming_tpu.utils.checkpoint import (
                commit_params_to_device,
            )
            params = commit_params_to_device(params, mesh)
        if device_worker is not None:
            # ALL groups multiplex through ONE child process (one process
            # owns the TPU): the PipelinedWorkerClient keeps one batch in
            # flight per group and pushes packs back through a shm ring,
            # so group ticks pipeline through the device instead of
            # ping-ponging one round trip each.
            from asr_streaming_tpu.streaming.device_worker import (
                PipelinedWorkerClient,
            )
            client = PipelinedWorkerClient(
                cfg, per, groups,
                pipeline_depth=kwargs.get("pipeline_depth", 1),
                **device_worker)
            self.groups = [Scheduler(params, cfg, vocab, max_slots=per,
                                     worker=client.group_view(g), **kwargs)
                           for g in range(groups)]
        else:
            self.groups = [Scheduler(params, cfg, vocab, max_slots=per,
                                     **kwargs) for _ in range(groups)]
        self.cfg = cfg
        self.vocab = self.groups[0].vocab
        self.language = self.groups[0].language
        self.max_slots = per * groups
        self._next = 0

    # -------------------------------------------------- scheduler surface

    @property
    def num_active(self) -> int:
        return sum(g.num_active for g in self.groups)

    @property
    def ticks(self) -> int:
        return sum(g.ticks for g in self.groups)

    @property
    def timers(self):
        outer = self

        class _Merged:
            def snapshot(self):
                snaps = [g.timers.snapshot() for g in outer.groups]
                out = snaps[0]
                for s in snaps[1:]:
                    for k, v in s["counters"].items():
                        out["counters"][k] = out["counters"].get(k, 0) + v
                return out

        return _Merged()

    def warmup(self) -> float:
        # one compile serves all groups (identical shapes); warm each
        # group's pipeline anyway
        total = 0.0
        for g in self.groups:
            total += g.warmup()
        return total

    def admit(self, stream_id: str) -> Optional[Stream]:
        # least-loaded group keeps batches balanced
        for g in sorted(self.groups, key=lambda g: g.num_active):
            s = g.admit(stream_id)
            if s is not None:
                s._group = g
                return s
        return None

    def release(self, stream: Stream) -> None:
        getattr(stream, "_group", self.groups[0]).release(stream)

    def is_pending(self, stream: Stream) -> bool:
        g = getattr(stream, "_group", None)
        return g.is_pending(stream) if g is not None else False

    def has_work(self) -> bool:
        return any(g.has_work() for g in self.groups)

    def tick(self) -> List[StreamEvent]:
        """Tick ONE group.  Selection order:

        1. a group whose in-flight harvest has ALREADY resolved — its
           events are sitting host-side and surface this tick instead of
           waiting behind other groups' gather phases (worth up to one
           group-tick of per-chunk latency; no starvation risk because
           servicing it also runs its gather+dispatch);
        2. otherwise the next round-robin group with work (ready chunks
           or an in-flight batch), which bounds a chunk's wait to ~one
           group-tick under real-time load.
        """
        n = len(self.groups)
        for k in range(n):
            g = self.groups[(self._next + k) % n]
            if g.harvest_ready():
                self._next = (self._next + k + 1) % n
                return g.tick()
        for k in range(n):
            g = self.groups[(self._next + k) % n]
            if g.has_work():
                self._next = (self._next + k + 1) % n
                return g.tick()
        g = self.groups[self._next]
        self._next = (self._next + 1) % n
        return g.tick()

    def drain(self, max_ticks: int = 10_000) -> List[StreamEvent]:
        events: List[StreamEvent] = []
        for _ in range(max_ticks):
            if not self.has_work():
                break
            events.extend(self.tick())
        return events

    def close(self) -> None:
        for g in self.groups:
            g.close()
