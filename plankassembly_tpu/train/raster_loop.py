"""Trainer for the raster/ViT modality.

Shares the full orchestration (fit/validate/test, checkpoints, metric
criterion, pred-JSON dumps) with the token trainers; swaps the dataset,
parameter init, loss, and decode entry points.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from plankassembly_tpu.config import Config
from plankassembly_tpu.data.raster import RasterDataset
from plankassembly_tpu.models.vit import (
    VitDims, greedy_decode_raster, init_vit_params, train_step_loss_raster,
)
from plankassembly_tpu.parallel.mesh import shard_params
from plankassembly_tpu.train.loop import Trainer
from plankassembly_tpu.train.state import init_state, make_train_step


class RasterTrainer(Trainer):
    """Raster-image inputs + ViT encoder."""

    train_augmentation = True

    def __init__(self, cfg: Config, log_dir=None, compute_dtype=jnp.bfloat16,
                 image_size: int | None = None, patch_size: int | None = None):
        super().__init__(cfg, log_dir=log_dir, compute_dtype=compute_dtype)
        self.vit = VitDims(
            image_size=image_size or cfg.DATA.IMAGE_SIZE,
            patch_size=patch_size or cfg.DATA.PATCH_SIZE)
        use_flash = (cfg.trainer.fused_attention
                     and jax.default_backend() == "tpu")
        # rebind with the raster loss (also picked up by the fused
        # device-data step via _step_kwargs)
        self._step_kwargs = dict(
            compute_dtype=compute_dtype, flash=use_flash,
            loss_impl=partial(train_step_loss_raster, vit=self.vit))
        self.train_step_fn = make_train_step(
            self.optimizer, self.dims, **self._step_kwargs)

    def _dataset(self, split_files: str, augmentation: bool):
        import os

        from plankassembly_tpu.data.loader import parse_splits_list
        info_files = parse_splits_list(split_files)
        kwargs = {}
        tc = self.cfg.trainer
        if tc.sample_cache or tc.device_data:
            kwargs["cache_dir"] = os.path.join(
                tc.default_root_dir, ".sample_cache")
        return RasterDataset(self.cfg.ROOT, info_files, self.cfg,
                             augmentation=augmentation,
                             image_size=self.vit.image_size, **kwargs)

    def init_state(self, seed: int | None = None):
        params = init_vit_params(
            jax.random.PRNGKey(seed if seed is not None
                               else self.cfg.seed_everything),
            self.dims, self.vit)
        params = shard_params(params, self.mesh, self.tensor_parallel)
        return init_state(params, self.optimizer)

    def _decode_batch(self, state, batch):
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if hasattr(v, "shape")}
        raster_in = {k: v for k, v in arrays.items()
                     if k in ("input_image", "input_lines",
                              "input_line_view", "input_line_inten")}
        impl = self.cfg.trainer.decode_impl
        if impl.startswith("beam") and impl[4:].isdigit():
            from plankassembly_tpu.models.vit import beam_decode_raster
            out = beam_decode_raster(state.params, raster_in,
                                     self.dims, self.vit,
                                     num_beams=int(impl[4:]),
                                     compute_dtype=self.compute_dtype)
            return arrays, out
        out = greedy_decode_raster(state.params, raster_in,
                                   self.dims, self.vit,
                                   compute_dtype=self.compute_dtype)
        return arrays, out

    def _write_prediction(self, pred_dir, name, sample, attach, gt, in_mask):
        # raster batches carry no input_mask; reuse the complete-modality
        # JSON contract
        import numpy as np
        return super()._write_prediction(pred_dir, name, sample, attach, gt,
                                         np.zeros(1, bool))
