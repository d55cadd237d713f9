"""Server entry point: ``python -m asr_streaming_tpu.server``.

Equivalent of the reference's ``streaming_server.py main()`` (reference:
streaming_decoder/streaming_server.py:613-661): argparse flags + env vars
(PORT, LANGUAGE, NORM_PORT) + YAML config, then model load and serve.
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_server(settings, max_slots=None):
    if getattr(settings, "device_worker", False):
        # Device-process isolation: the serving step runs in a spawned
        # child on the accelerator; THIS process (connections, rescorers,
        # text) pins jax to CPU so it never touches the device
        # (streaming/device_worker.py).  Must happen before any jax op.
        jax.config.update("jax_platforms", "cpu")
        logging.info("device_worker: serving step in a child process; "
                     "server process pinned to CPU jax")

    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()   # warm restarts skip the minutes-long XLA compile

    from asr_streaming_tpu.models.asr import ASRConfig
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_serving_params,
    )
    from asr_streaming_tpu.streaming.scheduler import Scheduler
    from asr_streaming_tpu.server.ws_server import StreamingServer
    from asr_streaming_tpu.text.corpus import corpus_paths
    from asr_streaming_tpu.text.vocab import load_vocab, placeholder_vocab
    from asr_streaming_tpu.utils.checkpoint import load_params

    import dataclasses

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        settings.compute_dtype]

    # resolve the production corpus (vocab + lexicon) for the vi path; the
    # reference loads these as package resources (lightspeech/datas/text.py:
    # 27-38) — here they come from ASR_CORPUS_DIR / config / known locations
    vocab = None
    if settings.vocab_path:
        if settings.vocab_path.endswith(".model"):
            # SentencePiece model (EN path; reference recognition.py:119)
            from asr_streaming_tpu.text.spm import load_spm_pieces
            vocab = load_spm_pieces(settings.vocab_path)
        else:
            vocab = load_vocab(settings.vocab_path)
    elif settings.language != "en":
        paths = corpus_paths(getattr(settings, "corpus_dir", None))
        if "vocab" in paths:
            vocab = load_vocab(paths["vocab"])
            logging.info("loaded corpus vocab (%d tokens) from %s",
                         len(vocab), paths["vocab"])
        if not settings.lexicon_path and "lexicon" in paths:
            settings.lexicon_path = paths["lexicon"]

    use_pallas = jax.default_backend() == "tpu"
    if settings.language == "en":
        # English path: Emformer-RNNT (reference streaming_server.py:176-181)
        from asr_streaming_tpu.models.rnnt import (
            RNNTConfig, rnnt_config_for_audio,
        )
        from asr_streaming_tpu.models.emformer import EmformerConfig
        rnnt_cfg = RNNTConfig(emformer=dataclasses.replace(
            RNNTConfig().emformer, compute_dtype=dtype,
            use_pallas_stack=use_pallas,
            quant=settings.quant if use_pallas else "none"))
        # the transcriber's streaming segment follows the audio geometry
        # (reduced EN variant: segment_size 8 -> 2 post-reduction frames,
        # reference asr-online-en.yaml:68-74)
        rnnt_cfg = rnnt_config_for_audio(rnnt_cfg, settings.audio)
        asr_cfg = dataclasses.replace(ASRConfig.vietnamese(dtype),
                                      audio=settings.audio)
        cfg = ServingConfig(asr=asr_cfg, model_kind="rnnt", rnnt=rnnt_cfg,
                            use_silero=settings.use_silero,
                            upload_encoding=settings.upload_encoding,
                            en_global_stats=settings.en_global_stats)
    else:
        from asr_streaming_tpu.models.asr import with_pallas_layer
        asr_cfg = dataclasses.replace(
            ASRConfig.vietnamese(compute_dtype=dtype),
            audio=settings.audio)
        asr_cfg = with_pallas_layer(asr_cfg, enable=use_pallas,
                                    quant=settings.quant)
        if vocab is not None:
            # the CTC head is sized by the served vocab (the reference sizes
            # it from checkpoint hparams; the shipped vocab.txt parses to 804
            # tokens — no trailing newline)
            asr_cfg = dataclasses.replace(
                asr_cfg,
                encoder=dataclasses.replace(asr_cfg.encoder,
                                            vocab_size=len(vocab)))
        cfg = ServingConfig(asr=asr_cfg, use_silero=settings.use_silero,
                            upload_encoding=settings.upload_encoding)

    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    # In device_worker mode the CHILD loads/converts the checkpoint; the
    # parent's params feed only host-side consumers.  The vi path has
    # none (the final rescorer is the C++ lexicon+LM beam), so skip the
    # duplicate torch conversion + ~140 MB host copy there; the EN
    # rescorer (predictor/joiner beam) does need the real weights.
    parent_needs_checkpoint = (not settings.device_worker
                               or cfg.model_kind == "rnnt")
    if settings.checkpoint and parent_needs_checkpoint:
        # .npz (framework, possibly partial e.g. bootstrap's am.npz) or a
        # reference torch checkpoint (.ckpt Lightning vi / .pt RNNT en)
        # converted on the fly (utils/checkpoint.load_params_auto)
        from asr_streaming_tpu.utils.checkpoint import load_params_auto
        params = load_params_auto(settings.checkpoint, like=params)
        logging.info("loaded checkpoint %s", settings.checkpoint)
    elif settings.checkpoint:
        logging.info("checkpoint %s loads in the device-worker child",
                     settings.checkpoint)
    else:
        logging.warning("no checkpoint configured — serving random weights")

    if settings.vad_weights:
        # trained Silero weights: .npz (from tools/onnx_weights.py) or a
        # raw silero_vad.onnx converted on the fly
        if settings.vad_weights.endswith(".onnx"):
            from asr_streaming_tpu.models.vad import silero_params_from_onnx
            from asr_streaming_tpu.tools.onnx_weights import (
                load_onnx_initializers,
            )
            params["vad"] = silero_params_from_onnx(
                load_onnx_initializers(settings.vad_weights), cfg.silero)
        else:
            loaded = load_params(settings.vad_weights,
                                 like={"vad": params["vad"]})
            params["vad"] = loaded["vad"]
        logging.info("loaded Silero VAD weights from %s",
                     settings.vad_weights)

    if vocab is None:
        size = (cfg.rnnt.vocab_size if cfg.model_kind == "rnnt"
                else cfg.asr.encoder.vocab_size)
        vocab = placeholder_vocab(size)
        logging.warning("no corpus vocab found — using placeholder vocab")

    slots = max_slots or settings.max_active_connections
    sched_kwargs = dict(
        language=settings.language,
        rules=settings.endpoint_rules,
        rulesets=settings.endpoint_rulesets,
        mapping_rule=settings.mapping_rule,
        ngram_cost=settings.ngram_cost(),
        en_beam_partials=settings.en_beam_partials,
        en_beam_width=settings.en_beam_width,
        en_beam_impl=getattr(settings, "en_beam_impl", "device"))
    dp = getattr(settings, "data_parallel", 1)
    if dp == 0 or dp > 1:
        # multi-chip serving: slot axis sharded over the local chips
        # (parallel/serving.py); dp=0 means all of them
        from asr_streaming_tpu.parallel.serving import make_serving_mesh
        n = dp or len(jax.devices())
        sched_kwargs["mesh"] = make_serving_mesh(n)
        logging.info("serving data-parallel over %d chips", n)
    if getattr(settings, "device_worker", False):
        if "mesh" in sched_kwargs:
            logging.warning("device_worker is exclusive with "
                            "data_parallel — data_parallel ignored")
            del sched_kwargs["mesh"]
        if sched_kwargs.get("en_beam_partials") and \
                sched_kwargs.get("en_beam_impl") == "host":
            logging.warning("en_beam_partials host impl needs in-process "
                            "device access — switching to the device "
                            "(batched on-TPU) beam for device_worker mode")
            sched_kwargs["en_beam_impl"] = "device"
        sched_kwargs["device_worker"] = dict(
            seed=0, checkpoint=settings.checkpoint,
            vad_weights=settings.vad_weights)
    groups = settings.scheduler_groups
    if groups > 1 or "device_worker" in sched_kwargs:
        # device_worker + groups multiplex through ONE child process
        # (PipelinedWorkerClient): group ticks pipeline through the
        # device instead of ping-ponging one tunnel round trip each
        from asr_streaming_tpu.streaming.scheduler import GroupedScheduler
        scheduler = GroupedScheduler(
            params, cfg, vocab, max_slots=slots,
            groups=groups, **sched_kwargs)
    else:
        scheduler = Scheduler(params, cfg, vocab, max_slots=slots,
                              **sched_kwargs)

    def _build_rescorer(lexicon_path, lm_path, **kwargs):
        from asr_streaming_tpu.decode.beam_native import make_native_rescorer
        r = make_native_rescorer(vocab, lexicon_path, lm_path, **kwargs)
        if r is None:   # no compiler: python fallback
            from asr_streaming_tpu.decode.beam import make_rescorer
            r = make_rescorer(vocab, lexicon_path, lm_path, **kwargs)
        return r

    base_lm_kwargs = dict(
        lm_weight=settings.lm_weight, beam_size=settings.beam_size,
        beam_size_token=settings.beam_size_token,
        beam_threshold=settings.beam_threshold,
        word_score=settings.word_score)
    rescorer = None
    if settings.lexicon_path and settings.lm_path:
        rescorer = _build_rescorer(settings.lexicon_path, settings.lm_path,
                                   **base_lm_kwargs)
    # the Linguistic_Model registry: one named rescorer per entry
    # (reference streaming_server.py:165-169); each entry's own
    # lm_weight/beam knobs override the flat defaults
    rescorers = {}
    for name, entry in (settings.lm_models or {}).items():
        lex = entry.get("lexicon_path") or settings.lexicon_path
        lm = entry.get("lm_path") or settings.lm_path
        if not (lex and lm):
            logging.warning("lm model %s: missing lexicon/lm — skipped",
                            name)
            continue
        kw = dict(base_lm_kwargs)
        kw.update({k: entry[k] for k in base_lm_kwargs if k in entry})
        if (lex, lm) == (settings.lexicon_path, settings.lm_path) and \
                kw == base_lm_kwargs and rescorer is not None:
            rescorers[name] = rescorer     # share the already-built one
        else:
            rescorers[name] = _build_rescorer(lex, lm, **kw)
    if rescorers:
        logging.info("Loaded LM models: %s", sorted(rescorers))
        if rescorer is None:
            rescorer = rescorers.get("GENERAL") or \
                next(iter(rescorers.values()))

    normalizer = None
    if settings.norm_url:
        import urllib.request
        import urllib.parse

        def normalizer(text: str) -> str:
            # reference utils.py:52-57 (incl. the phantram -> % fixup)
            data = urllib.parse.urlencode({"text": text}).encode()
            try:
                with urllib.request.urlopen(settings.norm_url, data=data,
                                            timeout=5) as r:
                    return r.read().decode().replace("phantram", "%")
            except Exception:
                logging.exception("normalizer call failed")
                return text

    speaker_verifier = None
    if settings.speaker_wav:
        from asr_streaming_tpu.models.ecapa import (
            EcapaConfig, SpeakerVerifier, init_ecapa_params,
        )
        from asr_streaming_tpu.train.data import read_wav
        ecfg = EcapaConfig()
        if settings.speaker_weights:
            # trained ECAPA weights: framework .npz or a raw speechbrain
            # embedding_model.ckpt converted on the fly
            if settings.speaker_weights.endswith((".ckpt", ".pt")):
                import torch
                from asr_streaming_tpu.tools.convert_ecapa import (
                    convert_ecapa_state_dict,
                )
                blob = torch.load(settings.speaker_weights,
                                  map_location="cpu", weights_only=False)
                sd = (blob.get("state_dict", blob)
                      if isinstance(blob, dict) else blob)
                sd = {k.removeprefix("embedding_model."): v
                      for k, v in sd.items()}
                eparams = jax.tree.map(jnp.asarray,
                                       convert_ecapa_state_dict(sd, ecfg))
            else:
                from asr_streaming_tpu.utils.checkpoint import load_params
                like = init_ecapa_params(jax.random.PRNGKey(1), ecfg)
                eparams = load_params(settings.speaker_weights, like=like)
            logging.info("loaded ECAPA speaker weights from %s",
                         settings.speaker_weights)
        else:
            # a random-init verifier still exercises the pipeline end to
            # end, but is_speaker is noise — ship speaker_weights in prod
            eparams = init_ecapa_params(jax.random.PRNGKey(1), ecfg)
            logging.warning("speaker verification running with RANDOM "
                            "ECAPA weights (set speaker_weights:)")
        wave, _sr = read_wav(settings.speaker_wav)
        speaker_verifier = SpeakerVerifier(
            eparams, ecfg, wave, threshold=settings.speaker_threshold)

    en_rescorer = None
    if cfg.model_kind == "rnnt" and not settings.en_beam_partials:
        # Final rescoring upgrades GREEDY-partial finals to beam quality.
        # In beam-partials mode the final text already IS the carried
        # beam hypothesis (the reference's contract — its EN final is the
        # hypothesis text, never re-decoded, streaming_server.py:530-538),
        # and re-running a host beam over the whole segment at EOS was
        # measured blocking __REQUEST_COMPLETED__ for minutes at
        # production segment sizes.
        from asr_streaming_tpu.models.rnnt import make_rnnt_rescorer
        from asr_streaming_tpu.utils.checkpoint import (
            commit_params_to_device,
        )
        # the beam passes params as explicit jit args per predictor/
        # joiner step — host numpy params would re-upload the weights on
        # EVERY beam expansion (same bug class as the tick path)
        en_rescorer = make_rnnt_rescorer(commit_params_to_device(params),
                                         cfg.rnnt, vocab)

    return StreamingServer(
        scheduler, rescorer=rescorer, rescorers=rescorers,
        normalizer=normalizer,
        en_rescorer=en_rescorer,
        speaker_verifier=speaker_verifier,
        doc_root=settings.doc_root, certificate=settings.certificate,
        send_internal=settings.send_internal,
        filter_noise=settings.filter_noise,
        noise_threshold_db=settings.noise_threshold_db,
        save_audio_dir="audio_cache" if settings.save_audio else None)


def install_graceful_signals() -> None:
    """Route SIGINT *and* SIGTERM into KeyboardInterrupt on the main thread.

    The graceful-drain path in main() must run no matter how the process
    was launched: backgrounded children of non-interactive shells inherit
    SIGINT=SIG_IGN (python then never installs its default
    KeyboardInterrupt handler, so plain `kill -INT` is silently ignored),
    and orchestrators send SIGTERM.  signal.signal overrides an inherited
    SIG_IGN, and handlers always run on the main thread — which main()
    parks in a join loop — so raising here unwinds straight into its
    `except KeyboardInterrupt` drain branch (scheduler.close() lets the
    device finish in-flight work; hard kills can wedge remote backends,
    NOTES_r2.md).
    """
    import signal

    def _graceful(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGINT, _graceful)
    signal.signal(signal.SIGTERM, _graceful)


def main():
    from asr_streaming_tpu.server.config import ServerSettings

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--port", type=int,
                        default=int(os.environ.get("PORT", 6006)))
    parser.add_argument("--max-active-connections", type=int, default=None)
    parser.add_argument("--max-message-size", type=int, default=1 << 20)
    parser.add_argument("--max-queue-size", type=int, default=32)
    parser.add_argument("--certificate", type=str, default=None)
    parser.add_argument("--doc-root", type=str, default=None)
    parser.add_argument("--log-dir", type=str, default="logs")
    parser.add_argument("--allow-random-weights", action="store_true",
                        help="boot with no checkpoint (serves random-"
                             "weight gibberish; dev/bench only)")
    args = parser.parse_args()

    from asr_streaming_tpu.utils.logs import setup_logger
    setup_logger(args.log_dir)   # rotating debug.log + INFO console
    settings = ServerSettings.load(args.config)

    # Fail-fast boot posture (VERDICT r4 weak #6): a config without a
    # checkpoint must not silently serve random-weight gibberish.  If
    # tools/bootstrap_assets.py left an overlay beside the config
    # (server-vi.yaml -> server-vi.local.yaml), adopt it; otherwise
    # require the explicit opt-in flag and print the one command that
    # produces real assets.
    if not settings.checkpoint and args.config:
        stem, ext = os.path.splitext(args.config)
        overlay = f"{stem}.local{ext or '.yaml'}"
        if os.path.exists(overlay):
            logging.info("no checkpoint in %s — adopting bootstrap "
                         "overlay %s", args.config, overlay)
            settings = ServerSettings.load(overlay)
    if not settings.checkpoint and not args.allow_random_weights:
        parser.exit(2, (
            f"error: {args.config or 'the default config'} configures no "
            "checkpoint, and no bootstrap overlay was found beside it — "
            "a boot now would serve random-weight gibberish.\n"
            "Either convert your deploy tree's assets first:\n"
            "    python tools/bootstrap_assets.py --tree "
            "/path/to/reference/deploy --out assets/\n"
            "(writes converted weights + a ready server-*.local.yaml "
            "overlay), or pass --allow-random-weights for a weightless "
            "dev/bench boot.\n"))
    if args.certificate:
        settings.certificate = args.certificate
    if args.doc_root:
        settings.doc_root = args.doc_root
    if args.max_active_connections:
        settings.max_active_connections = args.max_active_connections

    server = build_server(settings)
    server.max_message_size = args.max_message_size
    server.max_queue_size = args.max_queue_size

    # Run the asyncio loop on a SECONDARY thread and park the main
    # thread.  The axon remote-PJRT backend deadlocks when the main
    # thread runs a busy event loop concurrently with device work from
    # any thread (the harvest's device->host wait never completes —
    # minimal repro: a bare jitted matmul on a worker thread hangs while
    # main runs `asyncio.sleep` timers).  With the loop on a non-main
    # thread the same workload completes.  Device ticks already run on
    # the scheduler's dedicated tick thread either way.
    import sys
    import threading

    failure = []

    def loop_main():
        try:
            asyncio.run(server.run(args.port))
        except BaseException as e:   # noqa: BLE001 — reported via exit code
            failure.append(e)

    install_graceful_signals()

    t = threading.Thread(target=loop_main, name="asyncio-loop",
                         daemon=True)
    t.start()
    try:
        while t.is_alive():
            t.join(timeout=1.0)
    except KeyboardInterrupt:
        logging.info("interrupted — shutting down")
        # let the device finish in-flight work before the process dies:
        # hard-killing mid-device-op can wedge the remote backend
        # (NOTES_r2.md).  close() drains the device-worker child (if any).
        try:
            server.scheduler.close()
        except Exception:
            logging.exception("scheduler close failed")
        raise SystemExit(130)
    if failure:
        logging.error("server loop failed: %r", failure[0])
        sys.exit(1)


if __name__ == "__main__":
    main()
