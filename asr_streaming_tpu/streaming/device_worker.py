"""Device-process isolation: the serving step in a dedicated child process.

Motivation (two independent production wins):

* **GIL isolation** — under live websocket load the scheduler's host
  phases contend with hundreds of connection handlers for the server
  process's GIL (measured: gather 9 ms in bench vs ~100 ms inside the
  live server at 1000 connections).  In worker mode the device process
  runs nothing but the tick pipeline.
* **Event-loop isolation** — the axon remote-PJRT backend can deadlock
  when an asyncio event loop runs in the same process as device work
  (NOTES_r2.md); the worker process has no event loop at all.

Architecture: the parent keeps the Scheduler's host half (streams,
gather/scatter, endpointing); the audio staging buffers live in POSIX
shared memory that the parent writes directly (zero extra copies), and a
pipe carries tiny control messages:

    parent                         worker (spawned, fresh jax)
    ------                         --------------------------
    gather -> staging shm
    "dispatch idx,flags"  ----->   jnp.asarray(staging[idx]); step async
    "harvest"             ----->   np.asarray(oldest pack) -> pack shm
    pack shm <-----------------    "ok"
    "fetch slot,len"      ----->   emission slice -> fetch shm

The worker rebuilds params deterministically from (seed, checkpoint,
vad_weights) — jax PRNG is deterministic across processes, so
parent-side rescorers that need CPU copies of the same params agree.

Reference: the reference isolates GPU work per docker worker process
(docker-compose.yml); this is the in-framework equivalent with
shared-memory transport instead of a network hop.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import pickle
import time
from multiprocessing import shared_memory
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class WorkerInit:
    """Everything the worker needs to rebuild the device side."""
    cfg_bytes: bytes            # pickled ServingConfig
    max_slots: int
    seed: int = 0
    checkpoint: Optional[str] = None
    vad_weights: Optional[str] = None
    platform: Optional[str] = None   # force jax platform (tests: "cpu")
    pipeline_depth: int = 1


class DeviceWorkerClient:
    """Parent-side handle; the call surface the Scheduler's device
    phases map onto."""

    def __init__(self, cfg, max_slots: int, *, seed: int = 0,
                 checkpoint: Optional[str] = None,
                 vad_weights: Optional[str] = None,
                 platform: Optional[str] = None,
                 pipeline_depth: int = 1):
        from asr_streaming_tpu.models.serving import emission_width

        self.cfg = cfg
        self.max_slots = max_slots
        seg_len = cfg.asr.audio.segment_length
        self._seg_dtype = np.uint8 if cfg.upload_encoding == "mulaw" \
            else np.int16
        depth = max(1, pipeline_depth) + 1
        self._staging_shm = shared_memory.SharedMemory(
            create=True,
            size=depth * max_slots * seg_len * self._seg_dtype().nbytes)
        self.staging = np.ndarray((depth, max_slots, seg_len),
                                  self._seg_dtype,
                                  buffer=self._staging_shm.buf)
        self._fetch_width = emission_width(cfg)
        self._fetch_shm = shared_memory.SharedMemory(
            create=True,
            size=cfg.max_emission_frames * self._fetch_width * 4)
        self._fetch_arr = np.ndarray(
            (cfg.max_emission_frames, self._fetch_width), np.float32,
            buffer=self._fetch_shm.buf)

        ctx = mp.get_context("spawn")
        self._conn, child_conn = ctx.Pipe()
        self._req_id = 0        # request/reply pairing (see _recv)
        init = WorkerInit(cfg_bytes=pickle.dumps(cfg),
                          max_slots=max_slots, seed=seed,
                          checkpoint=checkpoint, vad_weights=vad_weights,
                          platform=platform,
                          pipeline_depth=pipeline_depth)
        self._proc = ctx.Process(
            target=_worker_main,
            args=(child_conn, init, self._staging_shm.name,
                  self._fetch_shm.name),
            name="asr-device-worker", daemon=True)
        self._proc.start()
        child_conn.close()
        self._pack_shm = None
        self._pack_arr = None

    # Whether harvest_async() is available (pack results pushed through a
    # ring of shared-memory buffers so multiple batches can be in flight
    # through one child).  See PipelinedWorkerClient.
    supports_pipelining = False

    # ------------------------------------------------------------- calls

    def warmup(self, timeout: float = 900.0) -> float:
        rid = self._send(("warmup",))
        kind, payload = self._recv(rid, timeout)
        assert kind == "warm", payload
        secs, pack_shm_name, pack_shape = payload
        self._pack_shm = shared_memory.SharedMemory(name=pack_shm_name)
        self._pack_arr = np.ndarray(tuple(pack_shape), np.float32,
                                    buffer=self._pack_shm.buf)
        return secs

    def stage(self, staging_idx: int) -> None:
        """Non-blocking: the worker starts the host->device copy of this
        staging buffer NOW, so the upload overlaps the parent's harvest
        (mirrors the in-process scheduler's early jnp.asarray; without
        it each tick pays the full H2D serially)."""
        self._send(("stage", staging_idx))

    def dispatch(self, staging_idx: int, contain, active, new_stream,
                 reset) -> None:
        """Non-blocking: the worker enqueues the (async) device step."""
        self._send(("dispatch", staging_idx,
                    np.packbits(contain), np.packbits(active),
                    np.packbits(new_stream), np.packbits(reset)))

    def harvest(self, timeout: float = 600.0) -> np.ndarray:
        """Blocks until the OLDEST in-flight step's pack is host-side."""
        rid = self._send(("harvest",))
        kind, payload = self._recv(rid, timeout)
        assert kind == "pack", payload
        return self._pack_arr.copy()

    def fetch_emission(self, slot: int, length: int,
                       timeout: float = 600.0) -> np.ndarray:
        rid = self._send(("fetch", int(slot), int(length)))
        kind, payload = self._recv(rid, timeout)
        assert kind == "emission", payload
        n = payload
        return self._fetch_arr[:n].copy()

    def close(self) -> None:
        try:
            self._send(("stop",))
        except (BrokenPipeError, OSError):
            pass
        self._proc.join(timeout=10)
        if self._proc.is_alive():
            self._proc.terminate()
        for shm in (self._staging_shm, self._fetch_shm, self._pack_shm):
            if shm is not None:
                try:
                    shm.close()
                    shm.unlink()
                except FileNotFoundError:
                    pass

    # ----------------------------------------------------------- internal

    def _send(self, msg) -> int:
        """Tag the request with a sequence id the worker echoes back."""
        self._req_id += 1
        self._conn.send((self._req_id,) + msg)
        return self._req_id

    def _recv(self, rid: int, timeout: float):
        """Receive the reply for request ``rid``, DISCARDING any stale
        replies from earlier timed-out requests — without ids, one
        timeout would permanently desynchronize the pipe (every later
        reply paired with the wrong request, and shared-memory reads
        racing the worker's writes for the next one)."""
        import time as _time

        deadline = _time.monotonic() + timeout
        while True:
            remaining = deadline - _time.monotonic()
            if remaining <= 0 or not self._conn.poll(remaining):
                raise TimeoutError(
                    f"device worker unresponsive after {timeout}s "
                    f"(alive={self._proc.is_alive()})")
            msg = self._conn.recv()
            got_rid, rest = msg[0], msg[1:]
            if rest[0] == "error":
                raise RuntimeError(f"device worker error:\n{rest[1]}")
            if got_rid == rid:
                return rest
            # stale reply from a timed-out request: drop it


def _worker_main(conn, init: WorkerInit, staging_name: str,
                 fetch_name: str) -> None:
    """Child process: owns params, device state, and the jitted step."""
    import traceback

    try:
        import jax

        if init.platform:
            jax.config.update("jax_platforms", init.platform)
        import jax.numpy as jnp

        if init.platform != "cpu":
            # warm restarts skip the minutes-long XLA compile (the cache
            # is enabled in the parent too, but the child is the process
            # that actually compiles the serving step)
            from asr_streaming_tpu.utils.compile_cache import (
                enable_compile_cache,
            )
            enable_compile_cache()

        from asr_streaming_tpu.models.serving import (
            _emission_packed, _unpack_f16_rows, emission_width,
            init_audio_context, init_emission_buffer, init_serving_params,
            init_serving_state, make_emission_fetcher, make_serving_step,
        )

        cfg = pickle.loads(init.cfg_bytes)
        # The parent pins ITSELF to CPU in worker mode, so the cfg it
        # built has the Pallas fast path off; re-decide from THIS
        # process's real backend (mirrors build_server's own rule) so
        # TPU workers get the fused kernels.
        if jax.default_backend() == "tpu":
            from asr_streaming_tpu.models.asr import with_pallas_layer
            new_asr = with_pallas_layer(cfg.asr)
            rnnt = cfg.rnnt
            if rnnt is not None and not (rnnt.emformer.use_pallas_layer
                                         or rnnt.emformer.use_pallas_stack):
                rnnt = dataclasses.replace(
                    rnnt, emformer=dataclasses.replace(
                        rnnt.emformer, use_pallas_stack=True))
            cfg = dataclasses.replace(cfg, asr=new_asr, rnnt=rnnt)
        B = init.max_slots
        params = init_serving_params(jax.random.PRNGKey(init.seed), cfg)
        if init.checkpoint:
            # npz (possibly partial, e.g. bootstrap's am.npz) or a
            # reference torch ckpt/pt converted on the fly — same loader
            # as the in-process server path
            from asr_streaming_tpu.utils.checkpoint import load_params_auto
            params = load_params_auto(init.checkpoint, like=params)
        if init.vad_weights:
            if init.vad_weights.endswith(".onnx"):
                from asr_streaming_tpu.models.vad import (
                    silero_params_from_onnx,
                )
                from asr_streaming_tpu.tools.onnx_weights import (
                    load_onnx_initializers,
                )
                params["vad"] = silero_params_from_onnx(
                    load_onnx_initializers(init.vad_weights), cfg.silero)
            else:
                from asr_streaming_tpu.utils.checkpoint import load_params
                loaded = load_params(init.vad_weights,
                                     like={"vad": params["vad"]})
                params["vad"] = loaded["vad"]
        # loaded checkpoints are HOST numpy arrays; params are explicit
        # jit args every dispatch — commit to device once
        # (utils/checkpoint.commit_params_to_device has the full story)
        from asr_streaming_tpu.utils.checkpoint import (
            commit_params_to_device,
        )
        params = commit_params_to_device(params)

        state = init_serving_state(cfg, B)
        ctx_arr = init_audio_context(cfg, B)
        emission = init_emission_buffer(cfg, B)
        fetcher = make_emission_fetcher(cfg)
        step_fn = make_serving_step(cfg)

        def _stepper(params, segment, contain, active, new_stream, reset,
                     state, ctx, emission):
            return step_fn(params, cfg, segment, contain, active,
                           new_stream, reset, state, ctx, emission)

        step = jax.jit(_stepper, donate_argnums=(6, 7, 8))

        seg_dtype = np.uint8 if cfg.upload_encoding == "mulaw" else np.int16
        seg_len = cfg.asr.audio.segment_length
        depth = max(1, init.pipeline_depth) + 1
        staging_shm = shared_memory.SharedMemory(name=staging_name)
        staging = np.ndarray((depth, B, seg_len), seg_dtype,
                             buffer=staging_shm.buf)
        fetch_shm = shared_memory.SharedMemory(name=fetch_name)
        fetch_arr = np.ndarray(
            (cfg.max_emission_frames, emission_width(cfg)), np.float32,
            buffer=fetch_shm.buf)

        pack_shm = None
        pack_arr = None
        pending = []            # in-flight ServingTickOutput
        staged = {}             # staging_idx -> device array (async H2D)

        def unpack_flags(bits):
            return jnp.asarray(np.unpackbits(bits, count=B).astype(bool))

        while True:
            msg = conn.recv()
            rid, op = msg[0], msg[1]
            if op == "stop":
                break
            elif op == "warmup":
                t0 = time.perf_counter()
                zeros = jnp.zeros((B,), bool)
                seg0 = jnp.zeros((B, seg_len),
                                 jnp.uint8 if seg_dtype == np.uint8
                                 else jnp.int16)
                out = step(params, seg0, zeros, zeros, zeros, zeros,
                           state, ctx_arr, emission)
                jax.block_until_ready(out.pack)
                state, ctx_arr, emission = out.state, out.ctx, out.emission
                pw = np.asarray(out.pack)
                pack_shm = shared_memory.SharedMemory(
                    create=True, size=pw.nbytes)
                pack_arr = np.ndarray(pw.shape, np.float32,
                                      buffer=pack_shm.buf)
                conn.send((rid, "warm", (time.perf_counter() - t0,
                                         pack_shm.name, pw.shape)))
            elif op == "stage":
                idx = msg[2]
                staged[idx] = jnp.asarray(staging[idx])  # async H2D
            elif op == "dispatch":
                _, _, idx, contain, active, new_stream, reset = msg
                seg_dev = staged.pop(idx, None)
                if seg_dev is None:
                    seg_dev = jnp.asarray(staging[idx])
                out = step(params, seg_dev, unpack_flags(contain),
                           unpack_flags(active), unpack_flags(new_stream),
                           unpack_flags(reset), state, ctx_arr, emission)
                state, ctx_arr, emission = out.state, out.ctx, out.emission
                try:
                    out.pack.copy_to_host_async()
                except AttributeError:
                    pass
                pending.append(out)
            elif op == "harvest":
                out = pending.pop(0)
                pack_arr[...] = np.asarray(out.pack)
                conn.send((rid, "pack", None))
            elif op == "fetch":
                _, _, slot, length = msg
                rows = fetcher(emission, slot, length)   # [L, W] f32
                fetch_arr[:len(rows), :rows.shape[1]] = rows
                conn.send((rid, "emission", len(rows)))
            else:
                conn.send((rid, "error", f"unknown op {op!r}"))
    except BaseException:
        try:
            conn.send((0, "error", traceback.format_exc()))
        except Exception:
            pass


# --------------------------------------------------------------------------
# Pipelined multi-group worker
# --------------------------------------------------------------------------
#
# The classic client above is strict request/reply: the parent's harvest
# blocks the pipe, so one batch is in flight at a time and every tick
# pays the full dispatch->result tunnel latency (~52 ms one-shot vs
# ~22 ms/step pipelined on the axon link — NOTES_r2.md).  The pipelined
# client multiplexes ALL scheduler groups through ONE child process
# (one process owns the TPU), keeps one batch in flight per group, and
# PUSHES pack results back through a ring of shared-memory buffers:
#
#     parent tick thread                 child
#     ------------------                 -----
#     dispatch g=A  ------------------>  step(state[A]) async; queue pack
#     dispatch g=B  ------------------>  step(state[B]) async; queue pack
#                     <---------------  "pack_ready rid_A, ring slot i"
#     (receiver thread copies ring[i], acks, resolves future A)
#
# A dedicated harvest thread in the child blocks on each pack in dispatch
# order while the child's main loop keeps accepting dispatches, so the
# device and the tunnel stay busy.  A dedicated receiver thread in the
# parent resolves per-request futures, so the scheduler's tick loop only
# waits when a result it needs has genuinely not arrived yet.


@dataclasses.dataclass(frozen=True)
class PipelinedWorkerInit:
    cfg_bytes: bytes
    per_slots: int              # slots per group
    n_groups: int
    ring_size: int
    seed: int = 0
    checkpoint: Optional[str] = None
    vad_weights: Optional[str] = None
    platform: Optional[str] = None
    staging_depth: int = 2      # buffers per group (depth+1 of depth 1)


class _GroupView:
    """The Scheduler-facing surface for one group of a shared
    PipelinedWorkerClient (same call shape as DeviceWorkerClient)."""

    supports_pipelining = True

    def __init__(self, client: "PipelinedWorkerClient", group: int):
        self._c = client
        self._g = group
        self.staging = client.staging[group]
        self._futures = []      # FIFO of in-flight dispatch futures

    def warmup(self, timeout: float = 900.0) -> float:
        return self._c.warmup(timeout)

    def stage(self, staging_idx: int) -> None:
        self._c.stage(self._g, staging_idx)

    def dispatch(self, staging_idx: int, contain, active, new_stream,
                 reset) -> None:
        self._futures.append(self._c.dispatch(
            self._g, staging_idx, contain, active, new_stream, reset))

    def harvest_async(self):
        """Future for the OLDEST in-flight dispatch of this group."""
        return self._futures.pop(0)

    def harvest(self, timeout: float = 600.0) -> np.ndarray:
        return self._futures.pop(0).result(timeout)

    def fetch_emission(self, slot: int, length: int,
                       timeout: float = 600.0) -> np.ndarray:
        return self._c.fetch_emission(self._g, slot, length, timeout)

    def close(self) -> None:
        self._c.release()


class PipelinedWorkerClient:
    """One spawned device process serving N scheduler groups with
    pipelined dispatch/harvest (see module notes above)."""

    def __init__(self, cfg, per_slots: int, n_groups: int = 1, *,
                 seed: int = 0, checkpoint: Optional[str] = None,
                 vad_weights: Optional[str] = None,
                 platform: Optional[str] = None,
                 pipeline_depth: int = 1):
        import threading
        from concurrent.futures import Future

        from asr_streaming_tpu.models.serving import emission_width

        self.cfg = cfg
        self.per_slots = per_slots
        self.n_groups = n_groups
        seg_len = cfg.asr.audio.segment_length
        self._seg_dtype = np.uint8 if cfg.upload_encoding == "mulaw" \
            else np.int16
        depth = max(1, pipeline_depth) + 1
        self.ring_size = n_groups + 2
        self._staging_shm = shared_memory.SharedMemory(
            create=True, size=n_groups * depth * per_slots * seg_len
            * self._seg_dtype().nbytes)
        self.staging = np.ndarray(
            (n_groups, depth, per_slots, seg_len), self._seg_dtype,
            buffer=self._staging_shm.buf)
        self._fetch_width = emission_width(cfg)
        self._fetch_shm = shared_memory.SharedMemory(
            create=True,
            size=cfg.max_emission_frames * self._fetch_width * 4)
        self._fetch_arr = np.ndarray(
            (cfg.max_emission_frames, self._fetch_width), np.float32,
            buffer=self._fetch_shm.buf)

        ctx = mp.get_context("spawn")
        self._conn, child_conn = ctx.Pipe()
        self._req_id = 0
        self._send_lock = threading.Lock()
        self._fetch_lock = threading.Lock()
        self._futures: dict = {}          # rid -> Future
        self._futures_lock = threading.Lock()
        self._dead: Optional[BaseException] = None
        init = PipelinedWorkerInit(
            cfg_bytes=pickle.dumps(cfg), per_slots=per_slots,
            n_groups=n_groups, ring_size=self.ring_size, seed=seed,
            checkpoint=checkpoint, vad_weights=vad_weights,
            platform=platform, staging_depth=depth)
        self._proc = ctx.Process(
            target=_pipelined_worker_main,
            args=(child_conn, init, self._staging_shm.name,
                  self._fetch_shm.name),
            name="asr-device-worker", daemon=True)
        self._proc.start()
        child_conn.close()
        self._pack_shm = None
        self._ring = None
        self._refs = n_groups
        self._warm: Optional[float] = None
        self._Future = Future
        self._recv_thread = threading.Thread(
            target=self._recv_loop, name="worker-recv", daemon=True)
        self._recv_thread.start()

    def group_view(self, group: int) -> _GroupView:
        return _GroupView(self, group)

    # ------------------------------------------------------------- calls

    def warmup(self, timeout: float = 900.0) -> float:
        """First caller triggers the child's compile; later group views
        return 0 immediately (one compile serves every group)."""
        if self._warm is not None:
            return 0.0
        fut = self._request(("warmup",))
        kind, payload = fut.result(timeout)
        assert kind == "warm", payload
        secs, pack_shm_name, ring_shape = payload
        self._pack_shm = shared_memory.SharedMemory(name=pack_shm_name)
        self._ring = np.ndarray(tuple(ring_shape), np.float32,
                                buffer=self._pack_shm.buf)
        self._warm = secs
        return secs

    def stage(self, group: int, staging_idx: int) -> None:
        self._post(("stage", group, staging_idx))

    def dispatch(self, group: int, staging_idx: int, contain, active,
                 new_stream, reset):
        """Non-blocking; returns a Future resolving to the pack."""
        return self._request(("dispatch", group, staging_idx,
                              np.packbits(contain), np.packbits(active),
                              np.packbits(new_stream), np.packbits(reset)))

    def fetch_emission(self, group: int, slot: int, length: int,
                       timeout: float = 600.0) -> np.ndarray:
        # one fetch buffer -> hold the lock across request + copy-out
        with self._fetch_lock:
            fut = self._request(("fetch", group, int(slot), int(length)))
            kind, n = fut.result(timeout)
            assert kind == "emission", n
            return self._fetch_arr[:n].copy()

    def release(self) -> None:
        """Called once per group view; the last release closes the child."""
        self._refs -= 1
        if self._refs <= 0:
            self.close()

    def close(self) -> None:
        try:
            with self._send_lock:
                self._conn.send((0, "stop"))
        except (BrokenPipeError, OSError):
            pass
        self._proc.join(timeout=10)
        if self._proc.is_alive():
            self._proc.terminate()
        for shm in (self._staging_shm, self._fetch_shm, self._pack_shm):
            if shm is not None:
                try:
                    shm.close()
                    shm.unlink()
                except FileNotFoundError:
                    pass

    # ----------------------------------------------------------- internal

    def _post(self, msg) -> None:
        """Fire-and-forget message (no reply expected)."""
        if self._dead is not None:
            raise RuntimeError("device worker died") from self._dead
        with self._send_lock:
            self._req_id += 1
            self._conn.send((self._req_id,) + msg)

    def _request(self, msg):
        """Send a message and register a Future for its reply."""
        if self._dead is not None:
            raise RuntimeError("device worker died") from self._dead
        fut = self._Future()
        with self._send_lock:
            self._req_id += 1
            rid = self._req_id
            with self._futures_lock:
                self._futures[rid] = fut
            self._conn.send((rid,) + msg)
        return fut

    def _recv_loop(self) -> None:
        """Single reader of the pipe: resolves futures, copies pack
        results out of the ring and acks the slot back to the child."""
        try:
            while True:
                try:
                    msg = self._conn.recv()
                except (EOFError, OSError):
                    raise RuntimeError(
                        "device worker pipe closed (child exited?)")
                rid, kind = msg[0], msg[1]
                if kind == "error":
                    raise RuntimeError(
                        f"device worker error:\n{msg[2]}")
                if kind == "pack_ready":
                    ring_slot = msg[2]
                    pack = self._ring[ring_slot].copy()
                    with self._send_lock:
                        self._conn.send((0, "ack", ring_slot))
                    payload = pack
                else:
                    payload = (kind,) + tuple(msg[2:])
                with self._futures_lock:
                    fut = self._futures.pop(rid, None)
                if fut is not None:
                    if kind == "pack_ready":
                        fut.set_result(payload)
                    else:
                        fut.set_result(payload)
        except BaseException as e:
            self._dead = e
            with self._futures_lock:
                pending = list(self._futures.values())
                self._futures.clear()
            for fut in pending:
                if not fut.done():
                    fut.set_exception(e)


def _pipelined_worker_main(conn, init: PipelinedWorkerInit,
                           staging_name: str, fetch_name: str) -> None:
    """Child: G serving states, one compiled step, a harvest thread that
    streams packs back through the shm ring in dispatch order."""
    import queue
    import threading
    import traceback

    send_lock = threading.Lock()

    def send(msg):
        with send_lock:
            conn.send(msg)

    try:
        import jax

        if init.platform:
            jax.config.update("jax_platforms", init.platform)
        import jax.numpy as jnp

        if init.platform != "cpu":
            from asr_streaming_tpu.utils.compile_cache import (
                enable_compile_cache,
            )
            enable_compile_cache()

        from asr_streaming_tpu.models.serving import (
            emission_width, init_audio_context, init_emission_buffer,
            init_serving_params, init_serving_state, make_emission_fetcher,
            make_serving_step,
        )

        cfg = pickle.loads(init.cfg_bytes)
        # parent pinned itself to CPU; re-enable the fused kernels from
        # THIS process's real backend (same rule as _worker_main)
        if jax.default_backend() == "tpu":
            from asr_streaming_tpu.models.asr import with_pallas_layer
            new_asr = with_pallas_layer(cfg.asr)
            rnnt = cfg.rnnt
            if rnnt is not None and not (rnnt.emformer.use_pallas_layer
                                         or rnnt.emformer.use_pallas_stack):
                rnnt = dataclasses.replace(
                    rnnt, emformer=dataclasses.replace(
                        rnnt.emformer, use_pallas_stack=True))
            cfg = dataclasses.replace(cfg, asr=new_asr, rnnt=rnnt)
        G, B = init.n_groups, init.per_slots
        params = init_serving_params(jax.random.PRNGKey(init.seed), cfg)
        if init.checkpoint:
            # npz (possibly partial, e.g. bootstrap's am.npz) or a
            # reference torch ckpt/pt converted on the fly — same loader
            # as the in-process server path
            from asr_streaming_tpu.utils.checkpoint import load_params_auto
            params = load_params_auto(init.checkpoint, like=params)
        if init.vad_weights:
            if init.vad_weights.endswith(".onnx"):
                from asr_streaming_tpu.models.vad import (
                    silero_params_from_onnx,
                )
                from asr_streaming_tpu.tools.onnx_weights import (
                    load_onnx_initializers,
                )
                params["vad"] = silero_params_from_onnx(
                    load_onnx_initializers(init.vad_weights), cfg.silero)
            else:
                from asr_streaming_tpu.utils.checkpoint import load_params
                loaded = load_params(init.vad_weights,
                                     like={"vad": params["vad"]})
                params["vad"] = loaded["vad"]
        # loaded checkpoints are HOST numpy arrays; params are explicit
        # jit args every dispatch — commit to device once
        # (utils/checkpoint.commit_params_to_device has the full story)
        from asr_streaming_tpu.utils.checkpoint import (
            commit_params_to_device,
        )
        params = commit_params_to_device(params)

        state = [init_serving_state(cfg, B) for _ in range(G)]
        ctx_arr = [init_audio_context(cfg, B) for _ in range(G)]
        emission = [init_emission_buffer(cfg, B) for _ in range(G)]
        fetcher = make_emission_fetcher(cfg)
        step_fn = make_serving_step(cfg)

        def _stepper(params, segment, contain, active, new_stream, reset,
                     state, ctx, emission):
            return step_fn(params, cfg, segment, contain, active,
                           new_stream, reset, state, ctx, emission)

        step = jax.jit(_stepper, donate_argnums=(6, 7, 8))

        seg_dtype = np.uint8 if cfg.upload_encoding == "mulaw" else np.int16
        seg_len = cfg.asr.audio.segment_length
        staging_shm = shared_memory.SharedMemory(name=staging_name)
        staging = np.ndarray((G, init.staging_depth, B, seg_len), seg_dtype,
                             buffer=staging_shm.buf)
        fetch_shm = shared_memory.SharedMemory(name=fetch_name)
        fetch_arr = np.ndarray(
            (cfg.max_emission_frames, emission_width(cfg)), np.float32,
            buffer=fetch_shm.buf)

        pack_shm = None
        ring = None
        free_slots: "queue.Queue[int]" = queue.Queue()
        harvest_q: "queue.Queue" = queue.Queue()
        staged = {}                     # (group, idx) -> device array

        def harvest_loop():
            while True:
                item = harvest_q.get()
                if item is None:
                    return
                rid, out = item
                try:
                    pack = np.asarray(out.pack)
                    slot = free_slots.get()
                    ring[slot][...] = pack
                    send((rid, "pack_ready", slot))
                except BaseException:
                    send((0, "error", traceback.format_exc()))
                    return

        harvest_thread = None

        def unpack_flags(bits):
            return jnp.asarray(np.unpackbits(bits, count=B).astype(bool))

        while True:
            msg = conn.recv()
            rid, op = msg[0], msg[1]
            if op == "stop":
                if harvest_thread is not None:
                    harvest_q.put(None)
                    harvest_thread.join(timeout=60)
                break
            elif op == "warmup":
                t0 = time.perf_counter()
                zeros = jnp.zeros((B,), bool)
                seg0 = jnp.zeros((B, seg_len),
                                 jnp.uint8 if seg_dtype == np.uint8
                                 else jnp.int16)
                out = step(params, seg0, zeros, zeros, zeros, zeros,
                           state[0], ctx_arr[0], emission[0])
                jax.block_until_ready(out.pack)
                state[0], ctx_arr[0], emission[0] = \
                    out.state, out.ctx, out.emission
                pw = np.asarray(out.pack)
                pack_shm = shared_memory.SharedMemory(
                    create=True, size=init.ring_size * pw.nbytes)
                ring_shape = (init.ring_size,) + pw.shape
                ring = np.ndarray(ring_shape, np.float32,
                                  buffer=pack_shm.buf)
                for i in range(init.ring_size):
                    free_slots.put(i)
                harvest_thread = threading.Thread(
                    target=harvest_loop, name="pack-harvest", daemon=True)
                harvest_thread.start()
                send((rid, "warm", (time.perf_counter() - t0,
                                    pack_shm.name, ring_shape)))
            elif op == "stage":
                g, idx = msg[2], msg[3]
                staged[(g, idx)] = jnp.asarray(staging[g, idx])
            elif op == "dispatch":
                _, _, g, idx, contain, active, new_stream, reset = msg
                seg_dev = staged.pop((g, idx), None)
                if seg_dev is None:
                    seg_dev = jnp.asarray(staging[g, idx])
                out = step(params, seg_dev, unpack_flags(contain),
                           unpack_flags(active), unpack_flags(new_stream),
                           unpack_flags(reset),
                           state[g], ctx_arr[g], emission[g])
                state[g], ctx_arr[g], emission[g] = \
                    out.state, out.ctx, out.emission
                try:
                    out.pack.copy_to_host_async()
                except AttributeError:
                    pass
                harvest_q.put((rid, out))
            elif op == "ack":
                free_slots.put(msg[2])
            elif op == "fetch":
                _, _, g, slot, length = msg
                rows = fetcher(emission[g], slot, length)
                fetch_arr[:len(rows), :rows.shape[1]] = rows
                send((rid, "emission", len(rows)))
            else:
                send((rid, "error", f"unknown op {op!r}"))
    except BaseException:
        try:
            send((0, "error", traceback.format_exc()))
        except Exception:
            pass
