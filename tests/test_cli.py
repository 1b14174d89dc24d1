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


def test_config_from_hparams_file(tmp_path):
    """bench.py reloads a run's true model hparams (e.g. GQA NUM_KV_HEAD)
    from the flat hparams.yaml dump instead of assuming defaults."""
    import dataclasses

    import yaml

    from plankassembly_tpu.config import Config, config_from_hparams_file

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, LR=3e-4,
        MODEL=dataclasses.replace(cfg.MODEL, NUM_KV_HEAD=2, NUM_MODEL=128))
    p = tmp_path / "hparams.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f)
    got = config_from_hparams_file(str(p))
    assert got.MODEL.NUM_KV_HEAD == 2
    assert got.MODEL.NUM_MODEL == 128
    assert got.LR == 3e-4
    assert got == cfg
