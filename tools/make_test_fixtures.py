#!/usr/bin/env python
"""Generate the committed trained-fixture assets for the test suite.

Runs the golden-loop fixtures' own trainers (tests/test_overfit_e2e.py,
tests/test_overfit_rnnt_e2e.py, tests/test_speaker_loop.py) under the
test environment's exact backend — CPU with an 8-virtual-device mesh —
and commits the accepted weights under assets/test_fixtures/.  The
fixtures re-verify these assets' golden properties at load time (the
same acceptance checks that gated training here), so a stale or
host-incompatible asset degrades to the training path, never to a green
lie.  See tests/fixture_assets.py (VERDICT r4 #5).

Usage: python tools/make_test_fixtures.py [--only ctc,rnnt,speaker]
"""

import argparse
import os
import sys
import time

os.environ["ASR_NO_FIXTURE_ASSETS"] = "1"   # force the training paths
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _unwrap(fixture):
    """The plain function under a @pytest.fixture decoration."""
    fn = getattr(fixture, "__wrapped__", None)
    if fn is not None:
        return fn
    # older pytest: marker object with .func
    return getattr(fixture, "func", fixture)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="ctc,rnnt,speaker")
    args = ap.parse_args()
    only = set(args.only.split(","))

    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.fixture_assets import save_asset

    if "ctc" in only:
        import tests.test_overfit_e2e as m1
        t0 = time.time()
        cfg, params, loss, golden = _unwrap(m1.trained)()
        print(f"ctc trained in {time.time() - t0:.0f}s "
              f"(loss={loss:.4f}, golden={golden!r})")
        print("->", save_asset("overfit_ctc", params,
                               {"golden": golden, "loss": loss}))
        t0 = time.time()
        vad, vloss = _unwrap(m1.trained_vad)((cfg, params, loss, golden))
        print(f"ctc vad trained in {time.time() - t0:.0f}s")
        print("->", save_asset("overfit_ctc_vad", vad,
                               {"loss": float(vloss)}))

    if "rnnt" in only:
        import tests.test_overfit_rnnt_e2e as m2
        t0 = time.time()
        vad_en = _unwrap(m2.trained_vad_en)()
        print(f"rnnt vad trained in {time.time() - t0:.0f}s")
        print("->", save_asset("overfit_rnnt_vad", vad_en, {}))
        t0 = time.time()
        params, loss, served, beam_golden = _unwrap(m2.trained)(vad_en)
        print(f"rnnt trained in {time.time() - t0:.0f}s "
              f"(loss={loss:.5f}, beam_golden={beam_golden!r})")
        print("->", save_asset("overfit_rnnt", params,
                               {"loss": loss, "beam_golden": beam_golden,
                                "served": served}))

    if "speaker" in only:
        import tests.test_speaker_loop as m3
        t0 = time.time()
        eparams, _ecfg, loss, gap, thr = _unwrap(m3.trained_speaker)()
        print(f"speaker trained in {time.time() - t0:.0f}s "
              f"(gap={gap:.3f})")
        print("->", save_asset("speaker_loop", eparams,
                               {"loss": float(loss), "gap": float(gap),
                                "threshold": float(thr)}))


if __name__ == "__main__":
    main()
