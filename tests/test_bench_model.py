"""bench.py's deterministic components (no TPU)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import model_paced_trace


def test_model_paced_trace_monotone_in_tick():
    prev = None
    for tick_ms in (5.0, 12.0, 25.0, 60.0):
        w, p = model_paced_trace(tick_ms / 1e3, 512, 2, 10.0, 0.64)
        assert 0.0 < w <= p
        if prev is not None:
            assert p >= prev
        prev = p


def test_model_paced_trace_magnitudes():
    # one group tick of queueing wait, events a few ticks after ready
    w, p = model_paced_trace(0.02, 512, 2, 10.0, 0.64)
    assert 10.0 <= w <= 40.0, w
    assert 40.0 <= p <= 120.0, p


def test_model_paced_trace_single_group():
    w, p = model_paced_trace(0.02, 256, 1, 5.0, 0.64)
    assert p >= w > 0.0
