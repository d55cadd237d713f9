#!/usr/bin/env python
"""Build a KenLM PROBING-format binary LM from a text ARPA file — the
in-repo twin of KenLM's ``build_binary [probing] in.arpa out.bin``
(which the reference's deploy hosts use to produce `3gram.bin`,
asr-online.yaml:22).  No KenLM installation required.

Usage:
    python tools/build_lm.py in.arpa out.bin [--multiplier 1.5]

The inverse direction needs no tool: the decoder configs accept either
format directly (asr_streaming_tpu.decode.kenlm_binary.load_lm sniffs
the magic).
"""

import argparse

from asr_streaming_tpu.decode.kenlm_binary import (
    KenLMBinary, sniff, write_probing,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("arpa", help="input text ARPA file")
    ap.add_argument("out", help="output .bin path (KenLM probing format)")
    ap.add_argument("--multiplier", type=float, default=1.5,
                    help="probing hash-table load multiplier (KenLM -p)")
    args = ap.parse_args()

    if sniff(args.arpa) is not None:
        raise SystemExit(f"{args.arpa} is already a KenLM binary")
    write_probing(args.arpa, args.out, probing_multiplier=args.multiplier)
    lm = KenLMBinary(args.out)          # verify it loads
    print(f"wrote {args.out}: order={lm.order} "
          f"counts={lm.header.counts} vocab={lm.bound} words")


if __name__ == "__main__":
    main()
