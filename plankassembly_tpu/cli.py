"""Command-line interface shared by the trainer entry points.

Mirrors the reference's LightningCLI surface (`trainer_complete.py:132-133`;
README usage `python trainer_complete.py fit --config configs/
train_complete.yaml --trainer.devices 1`):

    python trainer_complete.py fit  --config configs/train_complete.yaml
    python trainer_complete.py test --config ... --ckpt_path <dir>
    python trainer_complete.py validate --config ... --ckpt_path <dir>

Any other ``--dot.path value`` pair is applied as a config override.
"""
from __future__ import annotations

import os
import sys

from plankassembly_tpu.config import load_config


def parse_args(argv: list[str]):
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        sys.exit(0)
    subcommand = argv[0]
    if subcommand not in ("fit", "test", "validate"):
        raise SystemExit(f"unknown subcommand {subcommand!r} "
                         "(expected fit/test/validate)")
    config_path = None
    ckpt_path = None
    overrides: dict[str, str] = {}
    i = 1
    while i < len(argv):
        arg = argv[i]
        if arg == "--config":
            config_path = argv[i + 1]; i += 2
        elif arg == "--ckpt_path":
            ckpt_path = argv[i + 1]; i += 2
        elif arg.startswith("--"):
            overrides[arg[2:]] = argv[i + 1]; i += 2
        else:
            raise SystemExit(f"unexpected argument {arg!r}")
    if config_path is None:
        raise SystemExit("--config is required")
    return subcommand, config_path, ckpt_path, overrides


def main(trainer_cls, argv: list[str] | None = None):
    argv = argv if argv is not None else sys.argv[1:]
    subcommand, config_path, ckpt_path, overrides = parse_args(argv)
    cfg = load_config(config_path, overrides)

    force_cpu = os.environ.get("PLANK_FORCE_CPU", "").lower() not in (
        "", "0", "false")
    if cfg.trainer.accelerator == "cpu" or force_cpu:
        # debugging/smoke runs off-accelerator; must be set before any jax
        # backend use (env JAX_PLATFORMS is overridden on hosts whose site
        # config force-registers an accelerator plugin, so set it here).
        # PLANK_FORCE_CPU=1 forces this regardless of the config: without
        # it, a config defaulting to `accelerator: tpu` makes
        # `jax.devices()` initialize the accelerator plugin, which blocks
        # indefinitely when the device tunnel is down — the long-standing
        # "CLI fit hangs at startup" flake was exactly this.
        import jax
        jax.config.update("jax_platforms", "cpu")

    # multi-host (DCN): PLANK_NUM_PROCESSES/PLANK_COORDINATOR/PLANK_PROCESS_ID
    # or PLANK_DISTRIBUTED=1 (TPU pod auto-detect); no-op single host.
    from plankassembly_tpu.parallel.multihost import initialize_from_env
    initialize_from_env()

    trainer = trainer_cls(cfg)
    print(f"log_dir: {trainer.log_dir}", flush=True)

    if subcommand == "fit":
        state = (trainer.load_checkpoint(ckpt_path) if ckpt_path
                 else trainer.init_state())
        trainer.fit(state)
    else:
        if ckpt_path is None:
            raise SystemExit(f"{subcommand} requires --ckpt_path")
        state = trainer.load_checkpoint(ckpt_path)
        if subcommand == "validate":
            prec, rec, f1 = trainer.validate(state)
        else:
            prec, rec, f1 = trainer.test(state)
        print(f"precision={prec:.4f} recall={rec:.4f} fmeasure={f1:.4f}")


# console-script entry points (pyproject.toml); the root-level trainer_*.py
# shims remain the reference-compatible invocation surface
def main_complete():
    from plankassembly_tpu.train import Trainer
    main(Trainer)


def main_visible():
    from plankassembly_tpu.train import VisibleTrainer
    main(VisibleTrainer)


def main_sideface():
    from plankassembly_tpu.train import SidefaceTrainer
    main(SidefaceTrainer)


def main_raster():
    from plankassembly_tpu.train.raster_loop import RasterTrainer
    main(RasterTrainer)
