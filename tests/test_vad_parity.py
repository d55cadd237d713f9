"""Native GMM frame-VAD decision pinning + (gated) webrtcvad parity.

The native VAD (native/vad/frame_vad.cc) re-derives the WebRTC GMM
algorithm in float — the reference's first-stage gate
(stream.py:54-55, 166-188).  tools/vad_parity.py records its decisions
on a deterministic labeled corpus as a golden fixture; these tests pin
them (any behavioral drift in the C++ shows up as a fixture diff) and,
when a real `webrtcvad` wheel is importable, measure frame-by-frame
agreement with the original.
"""

import json
import os

import numpy as np
import pytest

from asr_streaming_tpu.models.frame_vad import native_available

import importlib.util

spec = importlib.util.spec_from_file_location(
    "vad_parity", os.path.join(os.path.dirname(__file__), "..", "tools",
                               "vad_parity.py"))
vad_parity = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vad_parity)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "vad_parity_golden.json")

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libframevad.so unavailable")


@pytest.fixture(scope="module")
def corpus():
    return vad_parity.build_corpus()


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(FIXTURE), \
        "run `python tools/vad_parity.py --record` once"
    return json.load(open(FIXTURE))


def test_corpus_is_deterministic(corpus, golden):
    pcm, labels = corpus
    assert vad_parity.corpus_digest(pcm) == golden["sha"]
    assert labels.tolist() == golden["labels"]


def test_decisions_pinned(corpus, golden):
    pcm, _ = corpus
    decisions = vad_parity.native_decisions(pcm)
    for mode in "0123":
        drift = int(np.sum(np.asarray(decisions[mode])
                           != np.asarray(golden["decisions"][mode])))
        assert drift == 0, f"mode {mode}: {drift} frames drifted"


def test_label_quality(corpus, golden):
    """The decisions must track the ground-truth labels, with the
    WebRTC characteristic: aggressiveness trades recall for rejection."""
    _, labels = corpus
    q = vad_parity.label_quality(golden["decisions"], labels)
    for mode in "01":
        assert q[mode]["speech_recall"] >= 0.9, q
    for mode in "0123":
        assert q[mode]["silence_reject"] >= 0.9, q
        assert q[mode]["speech_recall"] >= 0.65, q
    recalls = [q[m]["speech_recall"] for m in "0123"]
    rejects = [q[m]["silence_reject"] for m in "0123"]
    assert all(a >= b - 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert all(b >= a - 1e-9 for a, b in zip(rejects, rejects[1:]))


def test_true_parity_against_wheel(corpus):
    """Frame-by-frame agreement with the real webrtcvad extension —
    runs only where the wheel is installed (not in this image)."""
    pytest.importorskip("webrtcvad")
    pcm, _ = corpus
    ours = vad_parity.native_decisions(pcm)
    theirs = vad_parity.wheel_decisions(pcm)
    for mode in "0123":
        agree = float((np.asarray(ours[mode])
                       == np.asarray(theirs[mode])).mean())
        assert agree >= 0.85, f"mode {mode}: agreement {agree:.3f}"
