#!/usr/bin/env python
"""One-command migration acceptance: reference deploy tree -> live servers.

Ties the migration pieces together (MIGRATION.md): given a reference
deploy host's tree (the /opt/server_e2e layout its configs reference,
asr-online.yaml:1-2), this

  1. runs tools/bootstrap_assets.py (all weight converters + config
     overlays with every degraded default replaced),
  2. validates the overlays: they parse into ServerSettings, every
     referenced asset file exists, and the converted checkpoints load
     back through the checkpoint machinery,
  3. (unless --dry-run) boots the vi and en servers from the overlays,
     streams real audio through the reference's own websocket URL
     (test/asr_test.py pacing), and reports transcripts, first-partial
     latency, and completion per language,
  4. (with --goldens) scores word error rate against expected
     transcripts and fails the check above --max-wer.

Exit code 0 = every requested stage passed.  One JSON report on stdout.

Usage:
    python tools/migrate_check.py --tree /opt/server_e2e \\
        [--dry-run] [--langs vi,en] [--wav-vi test.wav] \\
        [--wav-en test_recording.wav] [--goldens goldens.json] \\
        [--max-wer 0.3] [--port-base 19200]

CI dry-runs this against a synthetic reference-shaped tree
(tests/test_migrate_check.py); the full server boot path is for deploy
hosts.  Reference surface being replaced: docker-compose.yml:1-63 +
config/asr-online.yaml.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_bootstrap():
    spec = importlib.util.spec_from_file_location(
        "bootstrap_assets", os.path.join(REPO, "tools",
                                         "bootstrap_assets.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def wer(ref: str, hyp: str) -> float:
    """Word error rate: token-level Levenshtein / len(ref)."""
    r, h = ref.split(), hyp.split()
    if not r:
        return 0.0 if not h else 1.0
    prev = list(range(len(h) + 1))
    for i, rt in enumerate(r, 1):
        cur = [i] + [0] * len(h)
        for j, ht in enumerate(h, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (rt != ht))
        prev = cur
    return prev[-1] / len(r)


def validate_overlay(path: str) -> dict:
    """Overlay parses + every referenced asset exists + weights load."""
    from asr_streaming_tpu.server.config import ServerSettings
    from asr_streaming_tpu.utils.checkpoint import load_params

    report = {"config": path, "ok": True, "problems": []}
    try:
        s = ServerSettings.load(path, env={})
    except Exception as e:                      # noqa: BLE001
        report["ok"] = False
        report["problems"].append(f"config parse failed: {e}")
        return report
    for key in ("checkpoint", "vad_weights", "speaker_weights",
                "lexicon_path", "lm_path", "lm_endpointing_path",
                "vocab_path", "en_global_stats", "speaker_wav"):
        val = getattr(s, key, None)
        if val and not os.path.exists(val):
            report["ok"] = False
            report["problems"].append(f"{key}: missing file {val}")
    for key in ("checkpoint", "vad_weights"):
        val = getattr(s, key, None)
        if val and os.path.exists(val) and val.endswith(".npz"):
            try:
                params = load_params(val)
                if not params:
                    raise ValueError("empty param tree")
            except Exception as e:              # noqa: BLE001
                report["ok"] = False
                report["problems"].append(f"{key}: failed to load: {e}")
    report["language"] = s.language
    return report


def drive_server(config: str, wav: str, port: int,
                 compile_timeout: float = 1500.0) -> dict:
    """Boot the server from the overlay, stream the wav through the
    reference URL, SIGINT it down.  Returns the per-language report."""
    log_path = f"/tmp/migrate_check_{port}.log"
    report = {"config": config, "wav": wav, "ok": False}
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [sys.executable, "-m", "asr_streaming_tpu.server",
             "--config", config, "--port", str(port)],
            stdout=log, stderr=subprocess.STDOUT, cwd=REPO)
    try:
        deadline = time.monotonic() + compile_timeout
        compiled = False
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                report["error"] = (f"server exited rc={proc.returncode}; "
                                   f"see {log_path}")
                return report
            if "serving step compiled" in open(log_path).read():
                compiled = True
                break
            time.sleep(2.0)
        if not compiled:
            report["error"] = f"compile timeout; see {log_path}"
            return report

        from asr_streaming_tpu.client.asr_client import (
            load_pcm, stream_audio,
        )
        import asyncio
        pcm = load_pcm(wav, target_rate=16000)
        url = (f"ws://127.0.0.1:{port}/voice/api/asr/v1/ws/decode_online"
               f"?token=migrate&rate=(int)16000")
        result = asyncio.run(stream_audio(url, pcm, realtime=False,
                                          sample_rate=16000))
        finals = [b.get("result", {}).get("hypotheses", [{}])[0]
                  .get("transcript_normed")
                  or b.get("result", {}).get("hypotheses", [{}])[0]
                  .get("transcript", "")
                  for b in result.finals]
        report.update({
            "ok": result.completed,
            "completed": result.completed,
            "transcript": " ".join(t.strip() for t in finals).strip(),
            "n_partials": len(result.partials),
            "n_finals": len(result.finals),
            "first_partial_latency_s":
                round(result.first_partial_latency, 3)
                if result.first_partial_latency else None,
            "total_seconds": round(result.total_seconds, 2),
        })
        return report
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGINT)     # graceful drain
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.send_signal(signal.SIGINT)
                try:
                    proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    pass                        # never hard-kill the chip


def run_check(tree: str, out_dir: str, configs_dir: str,
              langs=("vi", "en"), dry_run: bool = False,
              wavs: dict | None = None, goldens: dict | None = None,
              max_wer: float | None = None, port_base: int = 19200,
              **bootstrap_kwargs) -> dict:
    bootstrap_assets = _load_bootstrap()
    report: dict = {"tree": tree, "stages": {}}
    produced = bootstrap_assets.bootstrap(
        tree, out_dir, configs_dir, **bootstrap_kwargs)
    report["stages"]["bootstrap"] = {
        "ok": bool(produced),
        "produced": sorted(produced.keys()),
    }

    overlays = {}
    for lang in langs:
        path = os.path.join(configs_dir, f"server-{lang}.local.yaml")
        if os.path.exists(path):
            overlays[lang] = path
    report["stages"]["validate"] = {
        lang: validate_overlay(path) for lang, path in overlays.items()}
    report["ok"] = (report["stages"]["bootstrap"]["ok"]
                    and bool(overlays)
                    and all(v["ok"] for v in
                            report["stages"]["validate"].values()))

    if dry_run:
        report["mode"] = "dry-run (bootstrap + validation only)"
        return report

    report["mode"] = "full (servers booted, audio streamed)"
    wavs = wavs or {}
    serve: dict = {}
    for i, (lang, cfg_path) in enumerate(overlays.items()):
        wav = wavs.get(lang)
        if not wav:
            serve[lang] = {"skipped": "no wav provided"}
            continue
        serve[lang] = drive_server(cfg_path, wav, port_base + i)
        if goldens and lang in goldens and serve[lang].get("ok"):
            w = wer(goldens[lang], serve[lang].get("transcript", ""))
            serve[lang]["wer_vs_golden"] = round(w, 4)
            if max_wer is not None and w > max_wer:
                serve[lang]["ok"] = False
                serve[lang]["error"] = (f"WER {w:.3f} > --max-wer "
                                        f"{max_wer}")
    report["stages"]["serve"] = serve
    report["ok"] = report["ok"] and all(
        s.get("ok", True) for s in serve.values() if "skipped" not in s)
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tree", required=True)
    ap.add_argument("--out", default="assets")
    ap.add_argument("--configs", default="configs")
    ap.add_argument("--langs", default="vi,en")
    ap.add_argument("--dry-run", action="store_true",
                    help="bootstrap + config/asset validation only")
    ap.add_argument("--wav-vi", default=None)
    ap.add_argument("--wav-en", default=None)
    ap.add_argument("--goldens", default=None,
                    help='JSON file {"vi": "expected text", "en": ...}')
    ap.add_argument("--max-wer", type=float, default=None)
    ap.add_argument("--port-base", type=int, default=19200)
    args = ap.parse_args()
    if not os.path.isdir(args.tree):
        raise SystemExit(f"tree not found: {args.tree}")
    goldens = json.load(open(args.goldens)) if args.goldens else None
    report = run_check(
        args.tree, args.out, args.configs,
        langs=tuple(args.langs.split(",")), dry_run=args.dry_run,
        wavs={"vi": args.wav_vi, "en": args.wav_en},
        goldens=goldens, max_wer=args.max_wer, port_base=args.port_base)
    print(json.dumps(report, indent=2))
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
