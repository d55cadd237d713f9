#!/usr/bin/env python
"""Train and save the bench's production-geometry VAD fixture.

bench.py's paced phase exercises the REAL gating path: the serving step
routes each chunk through the Silero-shaped VAD
(models/serving.py::_vad_stage), so pacing with random VAD weights made
speech/silence verdicts arbitrary — round 3's bench probed 32 rng seeds
for a chunk that happened to decode (an honest hack the verdict asked to
delete).  This tool trains the production SileroConfig VAD (train/vad.py)
on the bench's own audio distribution — gaussian "speech" at the
amplitudes the bench paces with, plus silences and faint noise — until
its CHUNK decisions (any 512-sample window > 0.5, exactly the serving
gate) match the energy labels on every training wave, then saves the
weights to assets/bench_vad.npz.  bench.py loads the fixture when
present and paces through learned gates (extra.weights records it).

The fixture is ~0.4 MB and committed, so every driver bench run uses the
same learned gates.  Re-generate: python tools/make_bench_fixture.py

Reference anchor: the reference gates streams with the real
silero_vad.onnx before decode (vad_silero.py:12-23,
streaming_server.py:400-411); a bench that paces ungated random-VAD
traffic measures a path production never runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")   # tiny model; avoid the TPU
    import jax.numpy as jnp
    import numpy as np

    from asr_streaming_tpu.models.vad import silero_chunk_probs
    from asr_streaming_tpu.train.vad import (
        VadTrainConfig, train_vad, window_labels,
    )
    from asr_streaming_tpu.utils.audio import AudioConfig
    from asr_streaming_tpu.utils.checkpoint import save_params

    audio = AudioConfig()                       # vi serving geometry
    T = audio.buffer_length + audio.segment_length
    rng = np.random.default_rng(42)

    waves = []
    # bench speech: gaussian noise at the paced amplitudes (bench.py uses
    # 0.25 and 0.1-0.5 scaled candidates)
    for amp in (0.1, 0.2, 0.25, 0.35, 0.5):
        for _ in range(6):
            waves.append((rng.standard_normal(T) * amp).astype(np.float32))
    # speech that starts mid-chunk (leading silence context)
    for amp in (0.2, 0.4):
        for lead in (audio.buffer_length, T // 2):
            w = np.zeros(T, np.float32)
            w[lead:] = rng.standard_normal(T - lead) * amp
            waves.append(w)
    # silence and sub-gate noise floors
    waves.append(np.zeros(T, np.float32))
    for amp in (1e-4, 5e-4, 1e-3):
        for _ in range(4):
            waves.append((rng.standard_normal(T) * amp).astype(np.float32))
    waves = np.stack(waves)

    vcfg = VadTrainConfig(base_lr=3e-3)
    labels = window_labels(waves, vcfg.silero)
    assert labels.any() and not labels.all()

    for seed in (0, 1, 2, 3):
        params, loss = train_vad(waves, labels, vcfg, steps=300, seed=seed)
        probs = np.asarray(
            silero_chunk_probs(params, vcfg.silero, jnp.asarray(waves)))
        chunk_pred = (probs > 0.5).any(axis=1)
        chunk_true = labels.astype(bool).any(axis=1)
        ok = (chunk_pred == chunk_true).all()
        print(f"seed {seed}: bce {loss:.4f} chunk-decision match "
              f"{int((chunk_pred == chunk_true).sum())}/{len(waves)}")
        if ok:
            out = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "assets", "bench_vad.npz")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            save_params(out, params)
            print(f"saved {out}")
            return
    raise SystemExit("no seed reached exact chunk decisions")


if __name__ == "__main__":
    main()
