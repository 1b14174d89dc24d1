"""PlankModel: transformer encoder-decoder with an attachment-pointer head.

A TPU-first reimplementation of the reference seq2seq
(`/root/reference/plankassembly/models.py:11-343`):

- parameters are explicit pytrees with the 6 layers *stacked* on a leading
  axis and applied with `jax.lax.scan` (one compiled layer body, fast
  compiles, remat-friendly);
- all shapes are static; masks are additive biases;
- matmuls run in a configurable compute dtype (bfloat16 on TPU by default)
  with float32 softmax/logits;
- the training loss reproduces the reference's mixed vocab‖pointer‖switch
  distribution *exactly*, including its quirks (the triu fill value of
  ``eps=1e-6`` used as a logit in the training branch, `models.py:160-161`).

Autoregressive decoding lives in `plankassembly_tpu/decode.py` (KV-cached,
`lax.while_loop`), not here.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.config import Config

Params = Any  # nested dict pytree
NEG_INF = -1e9  # finite -inf stand-in: keeps softmax NaN-free on all-masked rows


@dataclasses.dataclass(frozen=True)
class ModelDims:
    """Static model geometry derived from a Config (`models.py:32-42`).

    num_kv_head < num_head enables grouped-query / multi-query attention
    (Shazeer 2019, arXiv 1911.02150) — an opt-in EXTENSION over the
    reference architecture (which is plain MHA): K/V project to num_kv_head
    heads shared by groups of num_head//num_kv_head query heads, shrinking
    the decode K/V caches (the AR loop's dominant HBM traffic) by the same
    factor. The default (= num_head) is bit-identical to the reference.
    """

    num_model: int
    num_head: int
    num_feedforward: int
    dropout: float
    num_encoder_layers: int
    num_decoder_layers: int
    num_view: int
    num_type: int
    num_input_dof: int
    num_output_dof: int
    max_input_length: int
    max_output_length: int
    vocab_size: int
    end: int
    pad: int
    num_kv_head: int = 0  # 0 -> num_head (plain MHA, the reference layout)

    @property
    def kv_heads(self) -> int:
        return self.num_kv_head or self.num_head

    @property
    def kv_groups(self) -> int:
        assert self.num_head % self.kv_heads == 0, \
            (self.num_head, self.kv_heads)
        return self.num_head // self.kv_heads

    @property
    def head_dim(self) -> int:
        return self.num_model // self.num_head

    @property
    def max_num_input(self) -> int:
        return math.ceil(self.max_input_length / self.num_input_dof)

    @property
    def max_num_output(self) -> int:
        return math.ceil(self.max_output_length / self.num_output_dof)

    @staticmethod
    def from_config(cfg: Config) -> "ModelDims":
        return ModelDims(
            num_model=cfg.MODEL.NUM_MODEL,
            num_head=cfg.MODEL.NUM_HEAD,
            num_kv_head=getattr(cfg.MODEL, "NUM_KV_HEAD", 0) or 0,
            num_feedforward=cfg.MODEL.NUM_FEEDFORWARD,
            dropout=cfg.MODEL.DROPOUT,
            num_encoder_layers=cfg.MODEL.NUM_ENCODER_LAYERS,
            num_decoder_layers=cfg.MODEL.NUM_DECODER_LAYERS,
            num_view=cfg.DATA.NUM_VIEW,
            num_type=cfg.DATA.NUM_TYPE,
            num_input_dof=cfg.DATA.NUM_INPUT_DOF,
            num_output_dof=cfg.DATA.NUM_OUTPUT_DOF,
            max_input_length=cfg.DATA.MAX_INPUT_LENGTH,
            max_output_length=cfg.DATA.MAX_OUTPUT_LENGTH,
            vocab_size=cfg.DATA.VOCAB_SIZE,
            end=cfg.TOKEN.END,
            pad=cfg.TOKEN.PAD,
        )


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _xavier(key, shape, dtype=jnp.float32):
    """Xavier-uniform, matching the reference's blanket re-init of every
    parameter with dim > 1 — including embeddings (`models.py:78-83`)."""
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _init_attn(key, dims: ModelDims, layers: int):
    d = dims.num_model
    dkv = dims.kv_heads * dims.head_dim  # == d for plain MHA
    ks = jax.random.split(key, 4)
    return {
        "wq": _xavier(ks[0], (layers, d, d)),
        "wk": _xavier(ks[1], (layers, d, dkv)),
        "wv": _xavier(ks[2], (layers, d, dkv)),
        "wo": _xavier(ks[3], (layers, d, d)),
        "bq": jnp.zeros((layers, d)),
        "bk": jnp.zeros((layers, dkv)),
        "bv": jnp.zeros((layers, dkv)),
        "bo": jnp.zeros((layers, d)),
    }


def _init_ffn(key, dims: ModelDims, layers: int):
    d, f = dims.num_model, dims.num_feedforward
    k1, k2 = jax.random.split(key)
    return {
        "w1": _xavier(k1, (layers, d, f)),
        "b1": jnp.zeros((layers, f)),
        "w2": _xavier(k2, (layers, f, d)),
        "b2": jnp.zeros((layers, d)),
    }


def _init_norm(layers=None, d=512):
    shape = (d,) if layers is None else (layers, d)
    return {"scale": jnp.ones(shape), "bias": jnp.zeros(shape)}


def init_params(key, dims: ModelDims) -> Params:
    """Build the full parameter pytree. Layer-stacked on the leading axis."""
    d = dims.num_model
    keys = jax.random.split(key, 16)

    embed = {
        # 5 summed input embeddings (`models.py:47-53`)
        "value": _xavier(keys[0], (dims.vocab_size, d)),
        "pos_in": _xavier(keys[1], (dims.max_num_input, d)),
        "coord_in": _xavier(keys[2], (dims.num_input_dof, d)),
        "view": _xavier(keys[3], (dims.num_view, d)),
        "type": _xavier(keys[4], (dims.num_type, d)),
        # output-side query embeddings (`models.py:56-57`)
        "coord_out": _xavier(keys[5], (dims.num_output_dof, d)),
        "pos_out": _xavier(keys[6], (dims.max_num_output, d)),
    }

    le, ld = dims.num_encoder_layers, dims.num_decoder_layers
    encoder = {
        "self_attn": _init_attn(keys[7], dims, le),
        "ffn": _init_ffn(keys[8], dims, le),
        "norm1": _init_norm(le, d),
        "norm2": _init_norm(le, d),
        "final_norm": _init_norm(None, d),
    }
    decoder = {
        "self_attn": _init_attn(keys[9], dims, ld),
        "cross_attn": _init_attn(keys[10], dims, ld),
        "ffn": _init_ffn(keys[11], dims, ld),
        "norm1": _init_norm(ld, d),
        "norm2": _init_norm(ld, d),
        "norm3": _init_norm(ld, d),
        "final_norm": _init_norm(None, d),
    }
    heads = {
        "vocab": {"w": _xavier(keys[12], (d, dims.vocab_size)),
                  "b": jnp.zeros((dims.vocab_size,))},
        "pointer": {"w": _xavier(keys[13], (d, d)), "b": jnp.zeros((d,))},
        "switch": {"w": _xavier(keys[14], (d, 1)), "b": jnp.zeros((1,))},
    }
    return {"embed": embed, "encoder": encoder, "decoder": decoder, "heads": heads}


# ---------------------------------------------------------------------------
# Core blocks (pure functions)
# ---------------------------------------------------------------------------

def layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _dropout(key, x, rate, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)


# Pallas fused-attention policy: "auto" uses the kernel on TPU when the
# caller opts in (inference paths — pallas_call has no autodiff rule, so
# training keeps the XLA path) and batch*heads fills the grid; True/False
# force it. See `ops/attention.py`.
FLASH_ATTENTION = "auto"


def _flash_enabled(B: int, H: int) -> bool:
    if FLASH_ATTENTION == "auto":
        return jax.default_backend() == "tpu" and B * H >= 128
    return bool(FLASH_ATTENTION)


def attention(p, q_in, kv_in, bias, dims: ModelDims, *, dropout_key=None,
              deterministic=True, compute_dtype=jnp.bfloat16,
              kv_lengths=None, flash=False, causal=False):
    """Multi-head attention with additive bias. q_in (B,Lq,D), kv_in (B,Lk,D),
    bias broadcastable to (B,H,Lq,Lk) with 0 / NEG_INF entries.

    When `kv_lengths` (B,) is given (pad keys form a suffix) and the fused
    kernel is enabled, dispatches to the Pallas kernels in `ops/` instead of
    materializing (B,H,Lq,Lk) scores — the inference kernel when
    deterministic, the differentiable in-kernel-dropout one when training
    (`ops/flash_train.py`). `causal` must mirror what `bias` encodes for the
    fused paths."""
    B, Lq, D = q_in.shape
    H, Dh = dims.num_head, dims.head_dim
    cd = compute_dtype

    q = (q_in.astype(cd) @ p["wq"].astype(cd) + p["bq"].astype(cd))
    k = (kv_in.astype(cd) @ p["wk"].astype(cd) + p["bk"].astype(cd))
    v = (kv_in.astype(cd) @ p["wv"].astype(cd) + p["bv"].astype(cd))
    q = q.reshape(B, Lq, H, Dh)
    k = k.reshape(B, -1, dims.kv_heads, Dh)
    v = v.reshape(B, -1, dims.kv_heads, Dh)
    if dims.kv_groups > 1:
        # GQA/MQA: broadcast each K/V head over its query-head group. XLA
        # fuses the repeat into the dots on the full-sequence paths.
        k = jnp.repeat(k, dims.kv_groups, axis=2)
        v = jnp.repeat(v, dims.kv_groups, axis=2)

    if flash and kv_lengths is not None and deterministic \
            and _flash_enabled(B, H):
        from plankassembly_tpu.ops.attention import flash_attention
        out = flash_attention(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3), kv_lengths,
                              causal=causal)
        out = out.transpose(0, 2, 1, 3)
    elif flash and kv_lengths is not None and not deterministic \
            and _flash_enabled(B, H):
        from plankassembly_tpu.ops.flash_train import fused_attention_train
        seed = jax.random.randint(dropout_key, (), 0, 2**31 - 1, jnp.int32)
        out = fused_attention_train(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), kv_lengths, seed, dims.dropout, causal)
        out = out.transpose(0, 2, 1, 3)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(Dh)
        if bias is not None:
            scores = scores + bias
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if not deterministic and dims.dropout > 0:
            weights = _dropout(dropout_key, weights, dims.dropout,
                               deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(cd), v,
                         preferred_element_type=jnp.float32).astype(cd)
    out = out.reshape(B, Lq, D).astype(cd)
    out = out @ p["wo"].astype(cd) + p["bo"].astype(cd)
    return out.astype(q_in.dtype)


def ffn(p, x, dims: ModelDims, *, dropout_key=None, deterministic=True,
        compute_dtype=jnp.bfloat16):
    cd = compute_dtype
    h = x.astype(cd) @ p["w1"].astype(cd) + p["b1"].astype(cd)
    h = jax.nn.relu(h)
    if not deterministic:
        h = _dropout(dropout_key, h, dims.dropout, deterministic)
    out = h @ p["w2"].astype(cd) + p["b2"].astype(cd)
    return out.astype(x.dtype)


def _take_layer(stacked, i):
    return jax.tree.map(lambda x: x[i], stacked)


def encode(params, inputs: dict, dims: ModelDims, *, rng=None,
           deterministic=True, compute_dtype=jnp.bfloat16, flash=False,
           seq_shard=None):
    """Embed the 5 input streams and run the pre-norm encoder stack.

    inputs: dict with input_value/pos/coord/view[/type] (B, Li) int32 and
    input_mask (B, Li) bool (True = pad). Returns memory (B, Li, D) float32.
    """
    emb = params["embed"]
    x = (emb["value"][inputs["input_value"]]
         + emb["pos_in"][inputs["input_pos"]]
         + emb["coord_in"][inputs["input_coord"]]
         + emb["view"][inputs["input_view"]])
    if "input_type" in inputs:
        x = x + emb["type"][inputs["input_type"]]
    return run_encoder_stack(params, x, inputs["input_mask"], dims, rng=rng,
                             deterministic=deterministic,
                             compute_dtype=compute_dtype, flash=flash,
                             seq_shard=seq_shard)


def run_encoder_stack(params, x, input_mask, dims: ModelDims, *, rng=None,
                      deterministic=True, compute_dtype=jnp.bfloat16,
                      flash=False, seq_shard=None):
    """Pre-norm encoder over already-embedded tokens x (B, L, D); shared by
    the token encoder and the raster/ViT encoder (`models/vit.py`).

    `seq_shard`: optional `NamedSharding` (e.g. P('data', 'seq', None)) for
    the (B, L, D) activations — sequence parallelism for the ≤1199-token
    encoder (SURVEY §5.7). Residuals, layernorms, and FFNs then run with the
    length axis split across the 'seq' mesh axis; XLA all-gathers K/V for the
    dense attention (the blockwise kernels keep a ring variant open later).
    The reference has no long-context story (`models.py:206` is single-GPU
    dense attention); this is the TPU-native extension point."""
    pad_bias = jnp.where(input_mask, NEG_INF, 0.0)[:, None, None, :]
    # pads are a suffix (data/packing.py), so a per-batch length is an exact
    # equivalent of the pad mask — lets the fused kernel skip mask arrays
    kv_lengths = (~input_mask).sum(axis=-1).astype(jnp.int32)

    enc = params["encoder"]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def constrain(y):
        if seq_shard is None:
            return y
        return jax.lax.with_sharding_constraint(y, seq_shard)

    x = constrain(x)

    def body(x, layer_and_idx):
        lp, idx = layer_and_idx
        key = jax.random.fold_in(rng, idx)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        h = layer_norm(lp["norm1"], x)
        a = attention(lp["self_attn"], h, h, pad_bias, dims, dropout_key=k1,
                      deterministic=deterministic, compute_dtype=compute_dtype,
                      kv_lengths=kv_lengths, flash=flash)
        x = constrain(x + _dropout(k2, a, dims.dropout, deterministic))
        h = layer_norm(lp["norm2"], x)
        f = ffn(lp["ffn"], h, dims, dropout_key=k3,
                deterministic=deterministic, compute_dtype=compute_dtype)
        x = constrain(x + _dropout(k4, f, dims.dropout, deterministic))
        return x, None

    stacked = {k: v for k, v in enc.items() if k != "final_norm"}
    idxs = jnp.arange(dims.num_encoder_layers)
    # remat: without it the scan saves every layer's (B, H, L, L) attention
    # weights as backward residuals — 37 GB at B=128, L=1199. Recomputing
    # the layer in the backward pass trades ~30% encoder FLOPs for ~all of
    # that HBM (the standard TPU recipe).
    x, _ = jax.lax.scan(jax.checkpoint(body), x, (stacked, idxs))
    return layer_norm(enc["final_norm"], x)


def embed_output(params, output_value, dims: ModelDims):
    """Shifted decoder input embeddings with the zero BOS vector
    (`models.py:114-138`): position j>=1 embeds token j-1 with coord
    (j-1)%6 and pos (j-1)//6; position 0 is all-zeros.

    output_value: (B, T) tokens; returns (B, T+1, D).
    """
    emb = params["embed"]
    B, T = output_value.shape
    positions = jnp.arange(T)
    coords = positions % dims.num_output_dof
    pos_ids = positions // dims.num_output_dof
    x = (emb["value"][output_value]
         + emb["coord_out"][coords][None, :, :]
         + emb["pos_out"][pos_ids][None, :, :])
    zero = jnp.zeros((B, 1, x.shape[-1]), x.dtype)
    return jnp.concatenate([zero, x], axis=1)


def decode_stack(params, x, memory, self_bias, cross_bias, dims: ModelDims, *,
                 rng=None, deterministic=True, compute_dtype=jnp.bfloat16,
                 flash=False, self_lengths=None, cross_lengths=None):
    """Pre-norm decoder stack over full sequences (training path).

    `self_lengths`/`cross_lengths` enable the fused kernels (they must agree
    with what the biases encode: causal+suffix-pad self-attention, suffix-pad
    cross-attention)."""
    dec = params["decoder"]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def body(x, layer_and_idx):
        lp, idx = layer_and_idx
        key = jax.random.fold_in(rng, idx)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        h = layer_norm(lp["norm1"], x)
        a = attention(lp["self_attn"], h, h, self_bias, dims, dropout_key=k1,
                      deterministic=deterministic, compute_dtype=compute_dtype,
                      kv_lengths=self_lengths, flash=flash, causal=True)
        x = x + _dropout(k2, a, dims.dropout, deterministic)
        h = layer_norm(lp["norm2"], x)
        c = attention(lp["cross_attn"], h, memory, cross_bias, dims,
                      dropout_key=k3, deterministic=deterministic,
                      compute_dtype=compute_dtype,
                      kv_lengths=cross_lengths, flash=flash)
        x = x + _dropout(k4, c, dims.dropout, deterministic)
        h = layer_norm(lp["norm3"], x)
        f = ffn(lp["ffn"], h, dims, dropout_key=k5,
                deterministic=deterministic, compute_dtype=compute_dtype)
        x = x + _dropout(k6, f, dims.dropout, deterministic)
        return x, None

    stacked = {k: v for k, v in dec.items() if k != "final_norm"}
    idxs = jnp.arange(dims.num_decoder_layers)
    # remat: see encode() — cross-attention residuals are (B, H, S, Li)
    x, _ = jax.lax.scan(jax.checkpoint(body), x, (stacked, idxs))
    return layer_norm(dec["final_norm"], x)


# ---------------------------------------------------------------------------
# Mixed vocab ‖ pointer ‖ switch distribution + loss (training branch)
# ---------------------------------------------------------------------------

def train_dists(params, hiddens, dims: ModelDims, eps=1e-6):
    """Log-prob dists over [vocab ‖ pointer], training branch of
    `_create_dist` (`models.py:140-166`). hiddens (B, S, D) -> (B, S, V+S).

    Reference quirks preserved: the pointer triu mask (incl. diagonal) fills
    *logits* with eps=1e-6 rather than -inf; switch probabilities clamp at
    eps before the log.
    """
    h32 = hiddens.astype(jnp.float32)
    hp = params["heads"]
    S = hiddens.shape[1]

    vocab_logits = h32 @ hp["vocab"]["w"] + hp["vocab"]["b"]
    pointer_feature = h32 @ hp["pointer"]["w"] + hp["pointer"]["b"]
    pointer_logits = jnp.einsum("bsd,btd->bst", pointer_feature, h32)
    pointer_logits = pointer_logits / dims.num_model

    prob_logit = h32 @ hp["switch"]["w"] + hp["switch"]["b"]
    prob = jax.nn.sigmoid(prob_logit)  # (B, S, 1)

    vocab_dists = jax.nn.log_softmax(vocab_logits, axis=-1)

    triu = jnp.triu(jnp.ones((S, S), bool))  # masked incl. diagonal
    pointer_logits = jnp.where(triu[None], eps, pointer_logits)
    pointer_dists = jax.nn.log_softmax(pointer_logits, axis=-1)

    vocab_dists = vocab_dists + jnp.log(jnp.clip(1 - prob, min=eps))
    pointer_dists = pointer_dists + jnp.log(jnp.clip(prob, min=eps))

    return jnp.concatenate([vocab_dists, pointer_dists], axis=-1)


def train_step_loss(params, batch, dims: ModelDims, *, rng=None,
                    deterministic=False, compute_dtype=jnp.bfloat16,
                    flash=False):
    """Teacher-forced NLL + token accuracy (`train_step`, `models.py:190-233`)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    enc_rng, dec_rng = jax.random.split(rng)

    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    memory = encode(params, inputs, dims, rng=enc_rng,
                    deterministic=deterministic, compute_dtype=compute_dtype,
                    flash=flash)

    # decoder inputs: tokens shifted right with zero BOS (`models.py:204`)
    x = embed_output(params, batch["output_value"][:, :-1], dims)
    S = x.shape[1]

    causal = jnp.triu(jnp.full((S, S), NEG_INF), k=1)[None, None]
    # reference passes output_mask (token positions) directly as the key-pad
    # mask over embed positions (`models.py:212-214`) — off-by-one preserved.
    tgt_pad = jnp.where(batch["output_mask"][:, :S], NEG_INF, 0.0)[:, None, None, :]
    self_bias = causal + tgt_pad
    cross_bias = jnp.where(batch["input_mask"], NEG_INF, 0.0)[:, None, None, :]

    self_lengths = (~batch["output_mask"][:, :S]).sum(axis=-1).astype(jnp.int32)
    cross_lengths = (~batch["input_mask"]).sum(axis=-1).astype(jnp.int32)
    hiddens = decode_stack(params, x, memory, self_bias, cross_bias, dims,
                           rng=dec_rng, deterministic=deterministic,
                           compute_dtype=compute_dtype, flash=flash,
                           self_lengths=self_lengths,
                           cross_lengths=cross_lengths)

    dists = train_dists(params, hiddens, dims)  # (B, S, V+S) log-probs

    labels = batch["output_label"]  # (B, S)
    valid = labels != dims.pad
    label_logp = jnp.take_along_axis(dists, labels[..., None], axis=-1)[..., 0]
    loss = -(label_logp * valid).sum() / jnp.maximum(valid.sum(), 1)

    predict = jnp.argmax(dists, axis=-1)
    correct = (valid & (predict == labels)).sum()
    accuracy = correct / (valid.sum() + 1e-10)

    return loss, {"loss": loss, "accuracy": accuracy}


# ---------------------------------------------------------------------------
# Structural pointer mask (shared with decode)
# ---------------------------------------------------------------------------

def pointer_structure_mask(dims: ModelDims) -> np.ndarray:
    """(S, S) 0/1 mask of legal attachments (`_generate_pointer_mask`,
    `models.py:91-101`): coordinate k of a plank may point to coordinate
    (k+3)%6 of an earlier plank, or to the same coordinate of the bbox
    (row 0); bbox tokens never point."""
    S = dims.max_output_length
    dof = dims.num_output_dof
    i = np.arange(S)[:, None]
    j = np.arange(S)[None, :]
    plank2plank = (j % dof) == ((i % dof) + dof // 2) % dof
    plank2bbox = (j % dof) == (i % dof)
    mask = np.where(j < dof, plank2bbox, plank2plank).astype(np.float32)
    mask[:dof, :] = 0.0
    return mask


# ---------------------------------------------------------------------------
# Convenience wrapper
# ---------------------------------------------------------------------------

class PlankModel:
    """Thin convenience wrapper bundling dims + pure functions."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.dims = ModelDims.from_config(cfg)

    def init(self, seed: int = 0) -> Params:
        return init_params(jax.random.PRNGKey(seed), self.dims)

    def loss(self, params, batch, rng=None, deterministic=False,
             compute_dtype=jnp.bfloat16):
        return train_step_loss(params, batch, self.dims, rng=rng,
                               deterministic=deterministic,
                               compute_dtype=compute_dtype)

    def encode(self, params, inputs, deterministic=True,
               compute_dtype=jnp.bfloat16):
        return encode(params, inputs, self.dims, deterministic=deterministic,
                      compute_dtype=compute_dtype)


def build_model(cfg: Config) -> PlankModel:
    """Mirror of the reference factory (`models.py:333-343`)."""
    return PlankModel(cfg)
