#!/usr/bin/env python
"""Assets bootstrap: reference deploy tree -> full-fidelity server configs.

The shipped configs default to a degraded stack (random AM weights,
energy-gate-only VAD, no LM) because the model assets live on the
reference's deploy hosts, not in any repo.  Pointed at such a host's
tree — the /opt/server_e2e layout the reference configs reference
(asr-online.yaml:1-2, 30, 136, 140; recognition.py:113-120) — this
script runs every converter, emits framework-native .npz weights, and
writes ready-to-run config overlays:

    python tools/bootstrap_assets.py --tree /opt/server_e2e \\
        [--out assets] [--configs configs]

Expected tree (globbed tolerantly under --tree):
    .../pretrained_v2/AM/asr-online.ckpt            Lightning AM ckpt
    .../pretrained_v2/AM/emformer-rnnt/emformer_rnnt.pt
    .../pretrained_v2/AM/emformer-rnnt/spm_bpe_4096.model
    .../pretrained_v2/LM/lexicon.txt, 3gram.bin (or .arpa)
    .../pretrained_v2/endpointing/lm_general.arpa
    .../pretrained_v2/vad/silero_vad_v5.onnx
    .../pretrained_v2/diar/ecapa-tdnn/embedding_model.ckpt

Outputs (--out): am.npz, rnnt.npz, silero_vad.npz, ecapa.npz plus
copied text assets; config overlays server-vi.local.yaml /
server-en.local.yaml with every asset key filled.  Anything missing in
the tree is reported and skipped — the overlay only upgrades the parts
that exist.  The 3gram KenLM binary needs no conversion: the decoder
loads it directly (asr_streaming_tpu/decode/kenlm_binary.py).
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _find(tree: str, *patterns: str) -> str | None:
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(tree, "**", pat),
                                recursive=True))
        if hits:
            return hits[0]
    return None


def bootstrap(tree: str, out_dir: str = "assets",
              configs_dir: str = "configs",
              am_layers: int = 20, rnnt_layers: int = 20,
              rnnt_pred_layers: int = 3, write_configs: bool = True,
              ecapa_cfg=None) -> dict:
    """Run all converters against the tree; returns {key: output path}
    for everything produced.  Converter geometry args exist so tests can
    bootstrap a synthetic tiny tree."""
    os.makedirs(out_dir, exist_ok=True)
    produced: dict = {}
    missing: list = []

    def note(key, path):
        produced[key] = path
        print(f"  {key:14s} -> {path}")

    # ---- Vietnamese acoustic model (Lightning ckpt)
    src = _find(tree, "asr-online.ckpt", "AM/*.ckpt")
    if src:
        from asr_streaming_tpu.tools.convert_checkpoint import (
            convert_lightning_checkpoint,
        )
        dst = os.path.join(out_dir, "am.npz")
        convert_lightning_checkpoint(src, dst, am_layers)
        note("checkpoint_vi", dst)
    else:
        missing.append("AM ckpt (asr-online.ckpt)")

    # ---- English RNNT (torchaudio emformer_rnnt_base state dict)
    src = _find(tree, "emformer_rnnt.pt")
    if src:
        from asr_streaming_tpu.tools.convert_rnnt_checkpoint import (
            convert_rnnt_checkpoint,
        )
        dst = os.path.join(out_dir, "rnnt.npz")
        convert_rnnt_checkpoint(src, dst, rnnt_layers, rnnt_pred_layers)
        note("checkpoint_en", dst)
    else:
        missing.append("emformer_rnnt.pt")

    # ---- Silero VAD (raw-protobuf ONNX weight extraction)
    src = _find(tree, "silero_vad*.onnx")
    if src:
        from asr_streaming_tpu.tools.onnx_weights import convert_silero
        dst = os.path.join(out_dir, "silero_vad.npz")
        convert_silero(src, dst)
        note("vad_weights", dst)
    else:
        missing.append("silero_vad_v5.onnx")

    # ---- ECAPA speaker embedding (speechbrain ckpt)
    src = _find(tree, "embedding_model.ckpt", "ecapa*/*.ckpt")
    if src:
        from asr_streaming_tpu.tools.convert_ecapa import (
            convert_ecapa_checkpoint,
        )
        from asr_streaming_tpu.models.ecapa import EcapaConfig
        dst = os.path.join(out_dir, "ecapa.npz")
        convert_ecapa_checkpoint(src, dst, ecapa_cfg or EcapaConfig())
        note("speaker_weights", dst)
    else:
        missing.append("ECAPA embedding_model.ckpt")

    # ---- text assets: copied verbatim (loaded directly by the server)
    for key, patterns in (
            ("lexicon_path", ("lexicon.txt",)),
            ("lm_path", ("3gram.bin", "*.bin", "3gram.arpa")),
            ("lm_endpointing_path", ("lm_general.arpa",
                                     "endpointing/*.arpa")),
            ("vocab_path", ("spm_bpe_4096.model", "*.model")),
            # EN feature normalization (reference recognition.py:107)
            ("en_global_stats", ("global_stats_rnnt.json",))):
        src = _find(tree, *patterns)
        if src:
            dst = os.path.join(out_dir, os.path.basename(src))
            if os.path.abspath(src) != os.path.abspath(dst):
                shutil.copyfile(src, dst)
            note(key, dst)
        else:
            missing.append(patterns[0])

    if missing:
        print("not found in tree (skipped): " + ", ".join(missing))

    if write_configs:
        _write_overlays(produced, out_dir, configs_dir)
    return produced


def _write_overlays(produced: dict, out_dir: str, configs_dir: str) -> None:
    """server-{vi,en}.local.yaml: the shipped config plus every asset key
    that bootstrapped, so the out-of-box degraded defaults disappear
    wherever the deploy tree provides the real thing."""
    overlays = {
        "server-vi.yaml": ("server-vi.local.yaml", {
            "checkpoint": produced.get("checkpoint_vi"),
            "lexicon_path": produced.get("lexicon_path"),
            "lm_path": produced.get("lm_path"),
            "lm_endpointing_path": produced.get("lm_endpointing_path"),
            "vad_weights": produced.get("vad_weights"),
            "speaker_weights": produced.get("speaker_weights"),
            "use_silero": ("true" if produced.get("vad_weights")
                           else None),
        }),
        "server-en.yaml": ("server-en.local.yaml", {
            "checkpoint": produced.get("checkpoint_en"),
            "vocab_path": produced.get("vocab_path"),
            "lm_endpointing_path": produced.get("lm_endpointing_path"),
            "vad_weights": produced.get("vad_weights"),
            "en_global_stats": produced.get("en_global_stats"),
            "use_silero": ("true" if produced.get("vad_weights")
                           else None),
        }),
    }
    for base_name, (local_name, updates) in overlays.items():
        base = os.path.join(configs_dir, base_name)
        if not os.path.exists(base):
            continue
        lines = open(base).read().splitlines(keepends=True)
        seen = set()
        out_lines = []
        for line in lines:
            key = line.split(":", 1)[0].strip()
            val = updates.get(key)
            if val is not None and not line.startswith((" ", "#")):
                out_lines.append(f"{key}: {_yaml_val(val)}\n")
                seen.add(key)
            else:
                out_lines.append(line)
        extra = [f"{k}: {_yaml_val(v)}\n" for k, v in updates.items()
                 if v is not None and k not in seen]
        if extra:
            out_lines.append("\n# added by tools/bootstrap_assets.py\n")
            out_lines.extend(extra)
        dst = os.path.join(configs_dir, local_name)
        with open(dst, "w") as f:
            f.writelines(out_lines)
        print(f"  config        -> {dst}")


def _yaml_val(v: str) -> str:
    return v if v in ("true", "false") else os.path.abspath(v)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tree", required=True,
                    help="reference deploy tree (e.g. /opt/server_e2e)")
    ap.add_argument("--out", default="assets")
    ap.add_argument("--configs", default="configs")
    ap.add_argument("--am-layers", type=int, default=20)
    ap.add_argument("--rnnt-layers", type=int, default=20)
    ap.add_argument("--rnnt-pred-layers", type=int, default=3)
    args = ap.parse_args()
    if not os.path.isdir(args.tree):
        raise SystemExit(f"tree not found: {args.tree}")
    print(f"bootstrapping from {args.tree}:")
    produced = bootstrap(args.tree, args.out, args.configs,
                         args.am_layers, args.rnnt_layers,
                         args.rnnt_pred_layers)
    if not produced:
        raise SystemExit("nothing bootstrapped — is the tree the "
                         "/opt/server_e2e layout?")


if __name__ == "__main__":
    main()
