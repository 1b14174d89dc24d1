"""Raster-input variant: ViT-style patch encoder + the same shape-program
decoder and pointer head.

Covers the raster-image modality (CAD2Program-style follow-up listed in
BASELINE.json configs): the three orthographic views arrive as a (3, S, S)
image instead of vector line tokens. Each view is split into
(S/patch)^2 patches; a patch token = linear(patch pixels) + learned 2D
position embedding + the (shared) view embedding. The encoder/decoder
stacks, loss, and KV-cached decode are reused verbatim — the variant swaps
only the input adapter, so every downstream component (pointer grammar,
matching metrics, pred-JSON dumps) works unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from plankassembly_tpu.models.model import (
    ModelDims, NEG_INF, _xavier, decode_stack, embed_output, init_params,
    run_encoder_stack, train_dists,
)


@dataclasses.dataclass(frozen=True)
class VitDims:
    image_size: int = 256
    patch_size: int = 16

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def tokens_per_view(self) -> int:
        return self.patches_per_side ** 2

    @property
    def num_tokens(self) -> int:
        return 3 * self.tokens_per_view


def init_vit_params(key, dims: ModelDims, vit: VitDims):
    """Token-model params + patch/2D-position embeddings."""
    params = init_params(key, dims)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 101))
    d = dims.num_model
    params["embed"]["patch"] = _xavier(k1, (vit.patch_size ** 2, d))
    params["embed"]["pos_patch"] = _xavier(k2, (vit.tokens_per_view, d))
    return params


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, V, S, S) -> (B, V * (S/p)^2, p^2)."""
    B, V, S, _ = images.shape
    n = S // patch
    x = images.reshape(B, V, n, patch, n, patch)
    x = x.transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(B, V * n * n, patch * patch)


def batch_images(batch: dict, vit: VitDims):
    """Resolve the raster input: a host-drawn `input_image`, or packed
    segment arrays rasterized ON DEVICE (`data.raster.rasterize_device`) —
    the TPU-native path: the host ships KBs of endpoints, the MXU draws."""
    if "input_image" in batch:
        return batch["input_image"]
    from plankassembly_tpu.data.raster import rasterize_device
    return rasterize_device(batch["input_lines"],
                            batch["input_line_view"],
                            batch["input_line_inten"], vit.image_size)


def encode_raster(params, images, dims: ModelDims, vit: VitDims, *, rng=None,
                  deterministic=True, compute_dtype=jnp.bfloat16,
                  flash=False):
    """ViT encoder: patch tokens -> shared transformer encoder stack.
    images (B, 3, S, S) float. Returns memory (B, T, D), T = 3*(S/p)^2."""
    emb = params["embed"]
    tokens = patchify(images.astype(jnp.float32), vit.patch_size)
    x = tokens @ emb["patch"]  # (B, T, D)

    T = vit.tokens_per_view
    pos = jnp.tile(emb["pos_patch"], (3, 1))  # (3T, D)
    view_ids = jnp.repeat(jnp.arange(3), T)
    x = x + pos[None] + emb["view"][view_ids][None]

    no_pad = jnp.zeros(x.shape[:2], bool)  # every patch token is valid
    return run_encoder_stack(params, x, no_pad, dims, rng=rng,
                             deterministic=deterministic,
                             compute_dtype=compute_dtype, flash=flash)


def train_step_loss_raster(params, batch, dims: ModelDims, vit: VitDims, *,
                           rng=None, deterministic=False,
                           compute_dtype=jnp.bfloat16, flash=False):
    """Teacher-forced loss for the raster modality (mirrors
    `model.train_step_loss` with the ViT encoder)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    enc_rng, dec_rng = jax.random.split(rng)

    memory = encode_raster(params, batch_images(batch, vit), dims, vit,
                           rng=enc_rng, deterministic=deterministic,
                           compute_dtype=compute_dtype, flash=flash)

    x = embed_output(params, batch["output_value"][:, :-1], dims)
    S = x.shape[1]
    causal = jnp.triu(jnp.full((S, S), NEG_INF), k=1)[None, None]
    tgt_pad = jnp.where(batch["output_mask"][:, :S], NEG_INF, 0.0)[:, None, None, :]
    T = memory.shape[1]
    cross_bias = jnp.zeros((1, 1, 1, T))

    self_lengths = (~batch["output_mask"][:, :S]).sum(axis=-1).astype(jnp.int32)
    cross_lengths = jnp.full((memory.shape[0],), T, jnp.int32)
    hiddens = decode_stack(params, x, memory, causal + tgt_pad, cross_bias,
                           dims, rng=dec_rng, deterministic=deterministic,
                           compute_dtype=compute_dtype, flash=flash,
                           self_lengths=self_lengths,
                           cross_lengths=cross_lengths)

    dists = train_dists(params, hiddens, dims)
    labels = batch["output_label"]
    valid = labels != dims.pad
    label_logp = jnp.take_along_axis(dists, labels[..., None], axis=-1)[..., 0]
    loss = -(label_logp * valid).sum() / jnp.maximum(valid.sum(), 1)

    predict = jnp.argmax(dists, axis=-1)
    accuracy = (valid & (predict == labels)).sum() / (valid.sum() + 1e-10)
    return loss, {"loss": loss, "accuracy": accuracy}


@partial(jax.jit, static_argnames=("dims", "vit", "compute_dtype",
                                   "early_exit"))
def greedy_decode_raster(params, batch, dims: ModelDims, vit: VitDims,
                         compute_dtype=jnp.bfloat16, early_exit=True):
    """KV-cached decode for the raster modality (shared decode loop)."""
    from plankassembly_tpu.decode import decode_from_memory

    memory = encode_raster(params, batch_images(batch, vit), dims, vit,
                           deterministic=True, compute_dtype=compute_dtype,
                           flash=True)
    no_pad = jnp.zeros(memory.shape[:2], bool)
    return decode_from_memory(params, memory, no_pad, dims,
                              compute_dtype=compute_dtype,
                              early_exit=early_exit)


@partial(jax.jit, static_argnames=("dims", "vit", "num_beams",
                                   "compute_dtype", "alpha"))
def beam_decode_raster(params, batch, dims: ModelDims, vit: VitDims,
                       num_beams: int = 4, compute_dtype=jnp.bfloat16,
                       alpha: float = 0.0):
    """Beam-search decode for the raster modality (shared beam loop;
    `plankassembly_tpu/beam.py` — the decoder stack is identical, only
    the encoder differs, so the beam rides the same per-program memory)."""
    from plankassembly_tpu.beam import beam_decode_from_memory

    memory = encode_raster(params, batch_images(batch, vit), dims, vit,
                           deterministic=True, compute_dtype=compute_dtype,
                           flash=True)
    no_pad = jnp.zeros(memory.shape[:2], bool)
    return beam_decode_from_memory(params, memory, no_pad, dims,
                                   num_beams=num_beams,
                                   compute_dtype=compute_dtype, alpha=alpha)
