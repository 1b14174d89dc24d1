"""CLI argument parsing (reference LightningCLI surface)."""
import pytest

from plankassembly_tpu.cli import parse_args


def test_parse_fit_with_overrides():
    sub, config, ckpt, overrides = parse_args(
        ["fit", "--config", "c.yaml", "--trainer.devices", "2",
         "--model.hparams.BATCH_SIZE", "8"])
    assert sub == "fit" and config == "c.yaml" and ckpt is None
    assert overrides == {"trainer.devices": "2",
                         "model.hparams.BATCH_SIZE": "8"}


def test_parse_test_with_ckpt():
    sub, config, ckpt, _ = parse_args(
        ["test", "--config", "c.yaml", "--ckpt_path", "ckpts/best"])
    assert sub == "test" and ckpt == "ckpts/best"


def test_unknown_subcommand_rejected():
    with pytest.raises(SystemExit):
        parse_args(["train", "--config", "c.yaml"])


def test_missing_config_rejected():
    with pytest.raises(SystemExit):
        parse_args(["fit"])
