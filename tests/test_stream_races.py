"""Concurrency stress: producer thread feeding audio while a consumer
thread pops chunks — no samples may be lost or duplicated.

(The reference is single-threaded asyncio; this framework runs scheduler
ticks in an executor thread, so the stream ring buffer is a genuine
shared structure — SURVEY.md §5 calls out the reference's fragile
shared-state invariants as something the rebuild must test.)
"""

import threading

import numpy as np

from asr_streaming_tpu.streaming.stream import Stream
from asr_streaming_tpu.utils.audio import AudioConfig

AUDIO = AudioConfig()
VOCAB = ["-", "|", "a"]


def test_concurrent_feed_and_pop_loses_nothing():
    stream = Stream(AUDIO, VOCAB, keep_audio_total=False)
    n_packets, packet = 400, 4000
    # payload encodes a global sample counter so ordering errors surface
    payload = (np.arange(n_packets * packet, dtype=np.float32) + 1.0) \
        / (n_packets * packet + 1)

    popped = []
    stop = threading.Event()

    def producer():
        for i in range(n_packets):
            stream.accept_waveform(payload[i * packet:(i + 1) * packet])
        stop.set()

    def consumer():
        while not (stop.is_set() and not stream.has_chunk()):
            if stream.has_chunk():
                popped.append(stream.pop_chunk())

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t1.start()
    t2.start()
    t1.join()
    t2.join()

    got = np.concatenate(popped) if popped else np.zeros(0)
    # popped segments start after the initial zero context of buffer_length
    # minus... the first pop contains payload[0:segment] shifted by nothing
    # (the zeros live in the context prefix, which pop_chunk skips).
    n = len(got)
    assert n > 0
    want = payload[:n]
    np.testing.assert_array_equal(got, want)
    # whatever remains in the buffer continues the sequence exactly
    rest = stream.buffer[AUDIO.buffer_length:]
    if rest.size:
        np.testing.assert_array_equal(rest, payload[n:n + rest.size])
