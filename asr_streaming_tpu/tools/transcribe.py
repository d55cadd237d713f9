"""Offline batch transcription CLI.

Equivalent of the reference's WAV-file client mode (reference:
asrclient_copy.py:357-456) without needing a running server: frames the
file like the streaming ring buffer, scans the model, and prints greedy
and (optionally) lexicon+LM beam transcripts with word alignments.

  python -m asr_streaming_tpu.tools.transcribe file.wav \
      [--checkpoint ckpt.npz --vocab vocab.txt \
       --lexicon lexicon.txt --lm lm.arpa]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("wav")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--lexicon", default=None)
    parser.add_argument("--lm", default=None)
    parser.add_argument("--align", default=None,
                        help="transcript to force-align instead of decode")
    parser.add_argument("--segment", action="store_true",
                        help="long-audio mode: VAD-segment into 3-15 s "
                        "speech groups and transcribe each with "
                        "timestamps (reference v1 detection.py flow)")
    parser.add_argument("--vad-weights", default=None,
                        help="silero npz/onnx for --segment (random "
                        "weights give poor segment boundaries)")
    args = parser.parse_args()

    from asr_streaming_tpu.models.api import ASRModel
    from asr_streaming_tpu.train.data import read_wav
    from asr_streaming_tpu.text.corpus import corpus_paths
    from asr_streaming_tpu.text.vocab import load_lexicon, load_vocab
    from asr_streaming_tpu.utils.resample import resample

    # default to the production corpus when no explicit paths are given
    if not args.lexicon:
        args.lexicon = corpus_paths().get("lexicon")
    vocab = load_vocab(args.vocab) if args.vocab else None
    lexicon = load_lexicon(args.lexicon) if args.lexicon else None
    model = ASRModel(checkpoint=args.checkpoint, vocab=vocab,
                     lexicon=lexicon)

    wave, sr = read_wav(args.wav)
    if sr != model.cfg.audio.sample_rate:
        wave = resample(wave, sr, model.cfg.audio.sample_rate)

    if args.align:
        tokens, words = model.force_alignment(wave, args.align)
        for w in words:
            print(f"{w.start:7.2f} {w.end:7.2f}  {w.label}"
                  f"  ({w.score:.2f})")
        return

    if args.segment:
        # long-audio pipeline: Silero timestamps -> 3-15 s groups ->
        # per-group decode (reference v1 models/detection.py:17-292)
        import jax

        from asr_streaming_tpu.models.segmenter import (
            get_speech_timestamps, group_segments,
        )
        from asr_streaming_tpu.models.vad import (
            SileroConfig, init_silero_params, silero_params_from_onnx,
        )

        scfg = SileroConfig()
        if args.vad_weights and args.vad_weights.endswith(".onnx"):
            from asr_streaming_tpu.tools.onnx_weights import (
                load_onnx_initializers,
            )
            vad_params = silero_params_from_onnx(
                load_onnx_initializers(args.vad_weights), scfg)
        elif args.vad_weights:
            from asr_streaming_tpu.utils.checkpoint import load_params
            like = init_silero_params(jax.random.PRNGKey(0), scfg)
            vad_params = load_params(args.vad_weights, like=like)
        else:
            vad_params = init_silero_params(jax.random.PRNGKey(0), scfg)
        sr16 = model.cfg.audio.sample_rate
        # timestamps come back in seconds (segmenter.py)
        segments = get_speech_timestamps(vad_params, scfg, wave)
        groups = group_segments(segments)
        for g in groups:
            lo = int(g["start"] * sr16)
            hi = int(g["end"] * sr16)
            text = model.transcribe(wave[lo:hi])
            print(f"{g['start']:7.2f} {g['end']:7.2f}  {text}")
        if not groups:
            print("(no speech segments found)")
        return

    print("greedy:", model.transcribe(wave))

    if args.lexicon and args.lm:
        emission = model.emissions(wave)
        try:
            from asr_streaming_tpu.decode.beam_native import \
                NativeBeamDecoder
            decoder = NativeBeamDecoder(model.vocab, args.lexicon, args.lm)
            result = decoder.decode_full(emission)
            print("beam:  ", result["transcript"])
            print(json.dumps(result["alignment"], ensure_ascii=False,
                             indent=2))
        except RuntimeError:
            from asr_streaming_tpu.decode.beam import (
                ArpaLM, LexiconBeamDecoder,
            )
            from asr_streaming_tpu.text.vocab import load_lexicon
            decoder = LexiconBeamDecoder(
                model.vocab, load_lexicon(args.lexicon),
                ArpaLM.from_arpa(args.lm))
            result = decoder.decode(emission)
            print("beam:  ", result.transcript)


if __name__ == "__main__":
    main()
