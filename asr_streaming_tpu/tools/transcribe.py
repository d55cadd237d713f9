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
