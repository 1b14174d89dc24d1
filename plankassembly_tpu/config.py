"""Configuration system.

Keeps the reference's YAML surface verbatim (`/root/reference/configs/
train_complete.yaml` et al., consumed via LightningCLI + detectron2 CfgNode in
`trainer_complete.py:8,26,132-133`) but backs it with plain frozen dataclasses
— no torch/detectron2. CLI overrides use the same dot-path convention as
LightningCLI (e.g. ``--trainer.devices 1``,
``--model.hparams.BATCH_SIZE 8``).
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass(frozen=True)
class TokenConfig:
    """Special tokens (`configs/train_complete.yaml:52-54`)."""

    END: int = 512
    PAD: int = 513


@dataclass(frozen=True)
class DataConfig:
    """Sequence/data contract (`configs/train_complete.yaml:35-47`)."""

    NUM_INPUT_DOF: int = 4
    NUM_OUTPUT_DOF: int = 6
    VOCAB_SIZE: int = 514
    NUM_VIEW: int = 3
    NUM_TYPE: int = 2
    MAX_INPUT_LENGTH: int = 1200
    MAX_OUTPUT_LENGTH: int = 128
    NUM_BITS: int = 9

    AUG_RATIO: float = 0.1
    NOISE_RATIO: float = 0.15
    NOISE_LENGTH: float = 0.02

    # Raster modality (ViT variant) image geometry.
    IMAGE_SIZE: int = 256
    PATCH_SIZE: int = 16

    # Sideface extraction (`configs/train_sideface.yaml:49-52`); units of
    # SCALE (model units). Only used by the sideface modality.
    SCALE: float = 1280.0
    MAX_THICKNESS: float = 50.0
    MIN_THICKNESS: float = 5.0
    MERGE_TOLERANCE: float = 5.0

    @property
    def max_num_input(self) -> int:
        return math.ceil(self.MAX_INPUT_LENGTH / self.NUM_INPUT_DOF)

    @property
    def max_num_output(self) -> int:
        return math.ceil(self.MAX_OUTPUT_LENGTH / self.NUM_OUTPUT_DOF)


@dataclass(frozen=True)
class ModelConfig:
    """Transformer hyperparameters (`configs/train_complete.yaml:56-64`)."""

    NUM_MODEL: int = 512
    NUM_HEAD: int = 8
    # Grouped-query / multi-query attention (extension over the reference):
    # number of shared K/V heads; 0 = NUM_HEAD (plain MHA, reference layout).
    # Shrinks decode K/V caches by NUM_HEAD/NUM_KV_HEAD.
    NUM_KV_HEAD: int = 0
    NUM_FEEDFORWARD: int = 1024
    DROPOUT: float = 0.2
    ACTIVATION: str = "relu"
    NORMALIZE_BEFORE: bool = True
    NUM_ENCODER_LAYERS: int = 6
    NUM_DECODER_LAYERS: int = 6


@dataclass(frozen=True)
class TrainerConfig:
    """Run/orchestration options.

    Mirrors the reference Lightning `trainer:` block
    (`configs/train_complete.yaml:3-22`), reinterpreted for TPU:
    ``devices`` is the size of the data-parallel mesh axis, ``strategy``
    selects the sharding layout (``ddp``/``dp`` both map to pjit data
    parallelism; ``dp+tp`` adds tensor parallelism over a ``model`` axis).
    """

    devices: int = 1
    strategy: str = "ddp"
    accelerator: str = "tpu"
    max_epochs: int = 1000
    check_val_every_n_epoch: int = 20
    num_sanity_val_steps: int = 0
    benchmark: bool = True
    # `detect_anomaly` (torch autograd NaN checks) maps to jax debug_nans.
    detect_anomaly: bool = False
    log_every_n_steps: int = 50
    default_root_dir: str = "lightning_logs"
    # Checkpointing policy (reference ModelCheckpoint callback,
    # `configs/train_complete.yaml:6-14`).
    checkpoint_monitor: str = "val/fmeasure"
    checkpoint_mode: str = "max"
    save_top_k: int = 1
    save_last: bool = True
    # TP axis size when strategy == "dp+tp".
    tensor_parallel: int = 1
    # Use the Pallas fused attention kernels (incl. the differentiable
    # in-kernel-dropout kernel) in the training step. TPU only.
    fused_attention: bool = True
    # int8-quantize decode cross-attention K/V + per-token self-KV
    # (~20% faster eval decode, measured F1 impact 2e-4; off by default
    # for strict parity).
    kv_quant: bool = False
    # kv-bucket rounding for eval decode: each distinct bucket compiles one
    # decode graph (cached persistently). Finer quanta cut cross-attention
    # HBM reads on short length-sorted batches.
    kv_quantum: int = 128
    # Decode schedule for eval/test: "auto" (XLA mxu path on TPU),
    # "persistent" (single-launch Pallas kernel, ops/persistent_decode.py
    # — the GQA serving path; early-exits in-launch since r4), "mxu",
    # "xla", or "beam<K>" (beam-search decode, plankassembly_tpu/beam.py —
    # beyond-reference accuracy mode, e.g. "beam4"). Persistent implies
    # int8 cross-KV / bf16 self-KV semantics.
    decode_impl: str = "auto"
    # Packed-sample cache (data/cache.py): pack each sample once into
    # memmaps under <default_root_dir>/.sample_cache; later epochs and
    # val/test reruns skip JSON+packing (aug samples always pack fresh).
    sample_cache: bool = False
    # Device-resident training data (data/device_loader.py): park the whole
    # packed split in HBM; per-step host traffic is an index vector plus
    # freshly-augmented rows. Implies sample_cache. Single-process only.
    device_data: bool = False


@dataclass(frozen=True)
class Config:
    """Top-level experiment configuration."""

    seed_everything: int = 2022
    trainer: TrainerConfig = field(default_factory=TrainerConfig)

    # model.hparams.* flat fields (`configs/train_complete.yaml:26-32`)
    ROOT: str = "data/data/complete/infos"
    DATASETS_TRAIN: str = "data/splits/train.txt"
    DATASETS_VALID: str = "data/splits/valid.txt"
    DATASETS_TEST: str = "data/splits/test.txt"
    BATCH_SIZE: int = 16
    NUM_WORKERS: int = 4
    LR: float = 1e-4
    THRESHOLD: float = 0.5

    DATA: DataConfig = field(default_factory=DataConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    TOKEN: TokenConfig = field(default_factory=TokenConfig)


_TRAINER_KEYS = {f.name for f in dataclasses.fields(TrainerConfig)}


def _coerce_to_type(value, ftype):
    """Coerce YAML scalars to the dataclass field type. Needed because
    pyyaml parses `1e-4`-style floats (no dot) as *strings* — the reference
    relied on jsonargparse's type coercion (`trainer_complete.py:132`)."""
    if ftype is float or ftype == "float":
        return float(value)
    if ftype is int or ftype == "int":
        return int(value)
    if ftype is bool or ftype == "bool":
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes")
        return bool(value)
    return value


def _build_dataclass(cls, data: dict):
    field_map = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in field_map:
            continue  # tolerate unknown keys (e.g. Lightning callbacks)
        ftype = field_map[key].type
        if dataclasses.is_dataclass(_resolve(ftype)) and isinstance(value, dict):
            kwargs[key] = _build_dataclass(_resolve(ftype), value)
        else:
            kwargs[key] = _coerce_to_type(value, ftype)
    return cls(**kwargs)


_TYPES = {
    "TokenConfig": TokenConfig,
    "DataConfig": DataConfig,
    "ModelConfig": ModelConfig,
    "TrainerConfig": TrainerConfig,
    "Config": Config,
}


def _resolve(ftype):
    if isinstance(ftype, str):
        return _TYPES.get(ftype, ftype)
    return ftype


def config_from_dict(raw: dict[str, Any]) -> Config:
    """Build a Config from a parsed reference-schema YAML dict."""
    flat: dict[str, Any] = {}
    if "seed_everything" in raw:
        flat["seed_everything"] = raw["seed_everything"]
    trainer_raw = dict(raw.get("trainer", {}) or {})
    trainer_raw.pop("callbacks", None)  # checkpoint policy is built in
    # The reference requests GPUs; we always run on the available backend.
    if trainer_raw.get("accelerator") == "gpu":
        trainer_raw["accelerator"] = "tpu"
    flat["trainer"] = _build_dataclass(TrainerConfig, trainer_raw)

    hparams = dict((raw.get("model", {}) or {}).get("hparams", {}) or {})
    for key in ("ROOT", "DATASETS_TRAIN", "DATASETS_VALID", "DATASETS_TEST",
                "BATCH_SIZE", "NUM_WORKERS", "LR", "THRESHOLD"):
        if key in hparams:
            flat[key] = hparams[key]
    if "DATA" in hparams:
        flat["DATA"] = _build_dataclass(DataConfig, hparams["DATA"])
    if "MODEL" in hparams:
        flat["MODEL"] = _build_dataclass(ModelConfig, hparams["MODEL"])
    if "TOKEN" in hparams:
        flat["TOKEN"] = _build_dataclass(TokenConfig, hparams["TOKEN"])
    # route through _build_dataclass for field-type coercion of flat scalars
    return _build_dataclass(Config, flat)


def config_from_hparams_file(path: str) -> Config:
    """Rebuild a Config from a run directory's `hparams.yaml` (the flat
    dataclass dump written by `Trainer._save_hyperparameters`). Lets tools
    like `bench.py` pick up a checkpoint's true model hyperparameters
    (e.g. a GQA `MODEL.NUM_KV_HEAD`) instead of assuming the defaults."""
    import yaml
    with open(path) as f:
        flat = dict(yaml.safe_load(f) or {})
    for key, cls in (("DATA", DataConfig), ("MODEL", ModelConfig),
                     ("TOKEN", TokenConfig), ("trainer", TrainerConfig)):
        if isinstance(flat.get(key), dict):
            flat[key] = _build_dataclass(cls, flat[key])
    return _build_dataclass(Config, flat)


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    return value


# Dot paths in LightningCLI style map onto our flattened Config fields.
_PATH_ALIASES = {
    "model.hparams": "",  # model.hparams.BATCH_SIZE -> BATCH_SIZE
}


def apply_overrides(cfg: Config, overrides: dict[str, str]) -> Config:
    """Apply `--a.b.c value` CLI overrides onto a Config."""
    for dotted, value in overrides.items():
        path = dotted
        for alias, repl in _PATH_ALIASES.items():
            if path.startswith(alias + "."):
                path = repl + path[len(alias) + 1:] if repl else path[len(alias) + 1:]
        parts = path.split(".")
        cfg = _set_path(cfg, parts, value)
    return cfg


def _set_path(node, parts, value):
    name = parts[0]
    if not dataclasses.is_dataclass(node) or not hasattr(node, name):
        raise KeyError(f"unknown config path segment: {name!r}")
    current = getattr(node, name)
    if len(parts) == 1:
        new_value = _coerce(value, current) if isinstance(value, str) else value
        return dataclasses.replace(node, **{name: new_value})
    return dataclasses.replace(node, **{name: _set_path(current, parts[1:], value)})


def load_config(path: str, overrides: dict[str, str] | None = None) -> Config:
    """Load a reference-schema YAML config file with optional overrides."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = config_from_dict(raw or {})
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg
