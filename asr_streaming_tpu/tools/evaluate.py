"""WER/CER evaluation: score transcriptions against a reference manifest.

The project's north star is WER parity with the reference stack on its
own audio (BASELINE.md), but neither the reference nor round 1 shipped a
measurement tool.  This CLI batch-transcribes a JSONL manifest
({"audio_filepath", "text"}) through the offline ASRModel pipeline
(greedy or lexicon+LM beam) and reports corpus WER/CER with per-utterance
breakdowns — alignment-based (Levenshtein with substitutions/insertions/
deletions counted separately), the standard definition.

  python -m asr_streaming_tpu.tools.evaluate --manifest eval.jsonl \
      [--checkpoint am.npz] [--beam] [--normalize] [--per-utt]

Also usable as a library: ``word_error_rate(refs, hyps)``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import unicodedata
from typing import List, Sequence, Tuple


@dataclasses.dataclass
class EditStats:
    substitutions: int = 0
    insertions: int = 0
    deletions: int = 0
    ref_len: int = 0

    @property
    def errors(self) -> int:
        return self.substitutions + self.insertions + self.deletions

    @property
    def rate(self) -> float:
        return self.errors / max(self.ref_len, 1)

    def __iadd__(self, other: "EditStats") -> "EditStats":
        self.substitutions += other.substitutions
        self.insertions += other.insertions
        self.deletions += other.deletions
        self.ref_len += other.ref_len
        return self


def edit_stats(ref: Sequence[str], hyp: Sequence[str]) -> EditStats:
    """Levenshtein alignment with S/I/D counts (uniform costs, the
    standard WER definition)."""
    R, H = len(ref), len(hyp)
    # dp[j] = (cost, subs, ins, dels) for prefix alignment
    prev = [(j, 0, j, 0) for j in range(H + 1)]
    for i in range(1, R + 1):
        cur = [(i, 0, 0, i)]
        for j in range(1, H + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = [(prev[j - 1][0], prev[j - 1], (0, 0, 0))]
            else:
                cand = [(prev[j - 1][0] + 1, prev[j - 1], (1, 0, 0))]
            cand.append((cur[j - 1][0] + 1, cur[j - 1], (0, 1, 0)))
            cand.append((prev[j][0] + 1, prev[j], (0, 0, 1)))
            cost, base, (ds, di, dd) = min(cand, key=lambda c: c[0])
            cur.append((cost, base[1] + ds, base[2] + di, base[3] + dd))
        prev = cur
    _cost, s, ins, dels = prev[H]
    return EditStats(substitutions=s, insertions=ins, deletions=dels,
                     ref_len=R)


def normalize_text(text: str) -> str:
    """Casefold + NFC + strip punctuation (keeps letters/digits/space)."""
    text = unicodedata.normalize("NFC", text).casefold()
    return " ".join("".join(
        c if (c.isalnum() or c.isspace()) else " " for c in text).split())


def word_error_rate(refs: Sequence[str], hyps: Sequence[str],
                    normalize: bool = False) -> EditStats:
    total = EditStats()
    for ref, hyp in zip(refs, hyps):
        if normalize:
            ref, hyp = normalize_text(ref), normalize_text(hyp)
        total += edit_stats(ref.split(), hyp.split())
    return total


def char_error_rate(refs: Sequence[str], hyps: Sequence[str],
                    normalize: bool = False) -> EditStats:
    total = EditStats()
    for ref, hyp in zip(refs, hyps):
        if normalize:
            ref, hyp = normalize_text(ref), normalize_text(hyp)
        total += edit_stats(list(ref.replace(" ", "")),
                            list(hyp.replace(" ", "")))
    return total


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True,
                        help="JSONL: audio_filepath + text (reference)")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--beam", action="store_true",
                        help="lexicon+LM beam finals instead of greedy")
    parser.add_argument("--lexicon", default=None)
    parser.add_argument("--lm", default=None)
    parser.add_argument("--normalize", action="store_true",
                        help="casefold+strip punctuation before scoring")
    parser.add_argument("--per-utt", action="store_true")
    parser.add_argument("--hyp-manifest", default=None,
                        help="score precomputed hypotheses (JSONL with "
                        "'text') instead of running the model")
    args = parser.parse_args(argv)

    from asr_streaming_tpu.train.data import load_manifest, read_wav

    entries = load_manifest(args.manifest)
    refs = [e["text"] for e in entries]

    decode_mode = "precomputed" if args.hyp_manifest else (
        "beam" if args.beam else "greedy")
    if args.hyp_manifest:
        hyps = [e["text"] for e in load_manifest(args.hyp_manifest)]
        assert len(hyps) == len(refs), (len(hyps), len(refs))
    else:
        from asr_streaming_tpu.models.api import ASRModel
        model = ASRModel(checkpoint=args.checkpoint)
        decode = None
        if args.beam:
            # --beam must never silently score greedy output: fail loud
            # on missing assets, fall back to the (slow but exact)
            # python beam when the native library is unavailable
            if not (args.lexicon and args.lm):
                raise SystemExit(
                    "--beam requires --lexicon and --lm")
            from asr_streaming_tpu.decode.beam_native import (
                make_native_rescorer,
            )
            decode = make_native_rescorer(model.vocab, args.lexicon,
                                          args.lm)
            if decode is None:
                from asr_streaming_tpu.decode.beam import make_rescorer
                decode = make_rescorer(model.vocab, args.lexicon,
                                       args.lm)
                decode_mode = "beam-python"
            if decode is None:
                raise SystemExit("beam decoder unavailable (no native "
                                 "library and python fallback failed)")
        hyps = []
        for e in entries:
            wave, _sr = read_wav(e["audio_filepath"])
            if decode is not None:
                emission = model.emissions(wave)

                class _Seg:
                    pass

                seg = _Seg()
                seg.emission = emission
                seg.length = len(emission)
                seg.offset = 0
                alignment = decode(seg)
                hyps.append(" ".join(a["word"] for a in alignment))
            else:
                hyps.append(model.transcribe(wave))

    wer = word_error_rate(refs, hyps, normalize=args.normalize)
    cer = char_error_rate(refs, hyps, normalize=args.normalize)
    if args.per_utt:
        for i, (r, h) in enumerate(zip(refs, hyps)):
            st = word_error_rate([r], [h], normalize=args.normalize)
            print(f"[{i}] wer={st.rate:.3f} ref={r!r} hyp={h!r}")
    print(json.dumps({
        "utterances": len(refs),
        "decode_mode": decode_mode,
        "wer": round(wer.rate, 4),
        "cer": round(cer.rate, 4),
        "substitutions": wer.substitutions,
        "insertions": wer.insertions,
        "deletions": wer.deletions,
        "ref_words": wer.ref_len,
    }))


if __name__ == "__main__":
    main()
