"""One-command migration acceptance (tools/migrate_check.py) dry-run
against the synthetic reference-shaped deploy tree.

The full mode boots the production servers and streams audio — deploy-
host work.  CI proves the pipeline: bootstrap runs every converter on
the tiny synthetic tree, the overlays parse into ServerSettings, every
referenced asset exists, converted weights load, and the WER scorer is
correct.  Reference surface being replaced: docker-compose.yml:1-63 +
config/asr-online.yaml (MIGRATION.md).
"""

import importlib.util
import os

import pytest

pytest.importorskip("torch")

# registers the synthetic-tree fixture chain
from tests.test_bootstrap_assets import fake_tree  # noqa: F401
from tests.test_convert_rnnt import synthetic_sd  # noqa: F401
from tests.test_convert_checkpoint import L as AM_L  # noqa: E402
from tests.test_convert_rnnt import L as RNNT_L, PL as RNNT_PL  # noqa: E402
from asr_streaming_tpu.models.ecapa import EcapaConfig  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "migrate_check",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "migrate_check.py"))
migrate_check = importlib.util.module_from_spec(spec)
spec.loader.exec_module(migrate_check)


def test_wer():
    assert migrate_check.wer("a b c", "a b c") == 0.0
    assert migrate_check.wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert migrate_check.wer("a b c d", "a b") == pytest.approx(0.5)
    assert migrate_check.wer("a", "a b b") == pytest.approx(2.0)
    assert migrate_check.wer("", "") == 0.0
    assert migrate_check.wer("", "x") == 1.0


def test_dry_run_on_synthetic_tree(fake_tree, tmp_path):  # noqa: F811
    cfgs = tmp_path / "configs"
    cfgs.mkdir()
    for name in ("server-vi.yaml", "server-en.yaml"):
        (cfgs / name).write_text(
            open(os.path.join("configs", name)).read())

    report = migrate_check.run_check(
        fake_tree, str(tmp_path / "assets"), str(cfgs),
        dry_run=True,
        am_layers=AM_L, rnnt_layers=RNNT_L, rnnt_pred_layers=RNNT_PL,
        ecapa_cfg=EcapaConfig.tiny())

    assert report["ok"], report
    assert report["stages"]["bootstrap"]["ok"]
    assert set(report["stages"]["validate"]) == {"vi", "en"}
    for lang, v in report["stages"]["validate"].items():
        assert v["ok"], v
        assert v["problems"] == []
        assert v["language"] == lang


def test_dry_run_flags_missing_asset(fake_tree, tmp_path):  # noqa: F811
    """A validated overlay pointing at a vanished asset fails loudly."""
    cfgs = tmp_path / "configs"
    cfgs.mkdir()
    for name in ("server-vi.yaml", "server-en.yaml"):
        (cfgs / name).write_text(
            open(os.path.join("configs", name)).read())
    report = migrate_check.run_check(
        fake_tree, str(tmp_path / "assets"), str(cfgs), dry_run=True,
        am_layers=AM_L, rnnt_layers=RNNT_L, rnnt_pred_layers=RNNT_PL,
        ecapa_cfg=EcapaConfig.tiny())
    assert report["ok"]

    # vanish the vi checkpoint, re-validate the overlay
    vi_overlay = str(cfgs / "server-vi.local.yaml")
    from asr_streaming_tpu.server.config import ServerSettings
    ckpt = ServerSettings.load(vi_overlay, env={}).checkpoint
    os.remove(ckpt)
    v = migrate_check.validate_overlay(vi_overlay)
    assert not v["ok"]
    assert any("checkpoint" in p for p in v["problems"])
