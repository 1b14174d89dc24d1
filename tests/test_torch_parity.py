"""Numerical parity vs torch reference semantics.

Transplants our JAX parameters into `torch.nn.TransformerEncoder/Decoder`
stacks configured exactly like the reference model (batch_first, pre-norm,
relu — `plankassembly/models.py:59-69`) and checks that encoder outputs,
decoder hiddens, and the mixed vocab‖pointer‖switch training loss agree to
float32 tolerance. This is the semantic bridge that justifies expecting
F1 parity with the published checkpoints.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from plankassembly_tpu.models.model import (
    ModelDims, NEG_INF, encode, decode_stack, embed_output, init_params,
    train_dists, train_step_loss,
)
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()
DIMS = ModelDims.from_config(CFG)
D = DIMS.num_model

torch.manual_seed(0)


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def build_torch_encoder(params):
    layer = torch.nn.TransformerEncoderLayer(
        D, DIMS.num_head, DIMS.num_feedforward, dropout=0.0,
        activation="relu", batch_first=True, norm_first=True)
    norm = torch.nn.LayerNorm(D)
    enc = torch.nn.TransformerEncoder(layer, DIMS.num_encoder_layers, norm)
    p = params["encoder"]
    with torch.no_grad():
        for i, lyr in enumerate(enc.layers):
            sa = p["self_attn"]
            wq, wk, wv = (np.asarray(sa[k][i]) for k in ("wq", "wk", "wv"))
            bq, bk, bv = (np.asarray(sa[k][i]) for k in ("bq", "bk", "bv"))
            # torch packs QKV as (3D, D) acting on x @ W^T
            lyr.self_attn.in_proj_weight.copy_(
                t(np.concatenate([wq.T, wk.T, wv.T], axis=0)))
            lyr.self_attn.in_proj_bias.copy_(t(np.concatenate([bq, bk, bv])))
            lyr.self_attn.out_proj.weight.copy_(t(np.asarray(sa["wo"][i]).T))
            lyr.self_attn.out_proj.bias.copy_(t(sa["bo"][i]))
            lyr.linear1.weight.copy_(t(np.asarray(p["ffn"]["w1"][i]).T))
            lyr.linear1.bias.copy_(t(p["ffn"]["b1"][i]))
            lyr.linear2.weight.copy_(t(np.asarray(p["ffn"]["w2"][i]).T))
            lyr.linear2.bias.copy_(t(p["ffn"]["b2"][i]))
            lyr.norm1.weight.copy_(t(p["norm1"]["scale"][i]))
            lyr.norm1.bias.copy_(t(p["norm1"]["bias"][i]))
            lyr.norm2.weight.copy_(t(p["norm2"]["scale"][i]))
            lyr.norm2.bias.copy_(t(p["norm2"]["bias"][i]))
        norm.weight.copy_(t(p["final_norm"]["scale"]))
        norm.bias.copy_(t(p["final_norm"]["bias"]))
    enc.eval()
    return enc


def build_torch_decoder(params):
    layer = torch.nn.TransformerDecoderLayer(
        D, DIMS.num_head, DIMS.num_feedforward, dropout=0.0,
        activation="relu", batch_first=True, norm_first=True)
    norm = torch.nn.LayerNorm(D)
    dec = torch.nn.TransformerDecoder(layer, DIMS.num_decoder_layers, norm)
    p = params["decoder"]
    with torch.no_grad():
        for i, lyr in enumerate(dec.layers):
            for attn_mod, key in ((lyr.self_attn, "self_attn"),
                                  (lyr.multihead_attn, "cross_attn")):
                a = p[key]
                wq, wk, wv = (np.asarray(a[k][i]) for k in ("wq", "wk", "wv"))
                bq, bk, bv = (np.asarray(a[k][i]) for k in ("bq", "bk", "bv"))
                attn_mod.in_proj_weight.copy_(
                    t(np.concatenate([wq.T, wk.T, wv.T], axis=0)))
                attn_mod.in_proj_bias.copy_(t(np.concatenate([bq, bk, bv])))
                attn_mod.out_proj.weight.copy_(t(np.asarray(a["wo"][i]).T))
                attn_mod.out_proj.bias.copy_(t(a["bo"][i]))
            lyr.linear1.weight.copy_(t(np.asarray(p["ffn"]["w1"][i]).T))
            lyr.linear1.bias.copy_(t(p["ffn"]["b1"][i]))
            lyr.linear2.weight.copy_(t(np.asarray(p["ffn"]["w2"][i]).T))
            lyr.linear2.bias.copy_(t(p["ffn"]["b2"][i]))
            lyr.norm1.weight.copy_(t(p["norm1"]["scale"][i]))
            lyr.norm1.bias.copy_(t(p["norm1"]["bias"][i]))
            lyr.norm2.weight.copy_(t(p["norm2"]["scale"][i]))
            lyr.norm2.bias.copy_(t(p["norm2"]["bias"][i]))
            lyr.norm3.weight.copy_(t(p["norm3"]["scale"][i]))
            lyr.norm3.bias.copy_(t(p["norm3"]["bias"][i]))
        norm.weight.copy_(t(p["final_norm"]["scale"]))
        norm.bias.copy_(t(p["final_norm"]["bias"]))
    dec.eval()
    return dec


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    batch_np = random_batch(CFG, batch_size=2, seed=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    return params, batch_np, batch


def torch_embed_input(params, batch_np):
    emb = params["embed"]
    x = (np.asarray(emb["value"])[batch_np["input_value"]]
         + np.asarray(emb["pos_in"])[batch_np["input_pos"]]
         + np.asarray(emb["coord_in"])[batch_np["input_coord"]]
         + np.asarray(emb["view"])[batch_np["input_view"]]
         + np.asarray(emb["type"])[batch_np["input_type"]])
    return t(x)


def test_encoder_parity(setup):
    params, batch_np, batch = setup
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    mine = np.asarray(encode(params, inputs, DIMS, deterministic=True,
                             compute_dtype=jnp.float32))

    enc = build_torch_encoder(params)
    x = torch_embed_input(params, batch_np)
    with torch.no_grad():
        ref = enc(x, src_key_padding_mask=torch.from_numpy(
            batch_np["input_mask"])).numpy()

    real = ~batch_np["input_mask"]
    np.testing.assert_allclose(mine[real], ref[real], atol=2e-5)


def test_decoder_and_loss_parity(setup):
    params, batch_np, batch = setup
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    memory_j = encode(params, inputs, DIMS, deterministic=True,
                      compute_dtype=jnp.float32)

    # --- my hiddens ---
    x = embed_output(params, batch["output_value"][:, :-1], DIMS)
    S = x.shape[1]
    causal = jnp.triu(jnp.full((S, S), NEG_INF), k=1)[None, None]
    tgt_pad = jnp.where(batch["output_mask"][:, :S], NEG_INF, 0.0)[:, None, None, :]
    cross = jnp.where(batch["input_mask"], NEG_INF, 0.0)[:, None, None, :]
    mine_h = np.asarray(decode_stack(
        params, x, memory_j, causal + tgt_pad, cross, DIMS,
        deterministic=True, compute_dtype=jnp.float32))

    # --- torch hiddens on the same memory ---
    dec = build_torch_decoder(params)
    x_t = t(np.asarray(x))
    mem_t = t(np.asarray(memory_j))
    tgt_mask = torch.triu(torch.full((S, S), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref_h = dec(x_t, mem_t, tgt_mask=tgt_mask,
                    tgt_key_padding_mask=torch.from_numpy(
                        batch_np["output_mask"][:, :S]),
                    memory_key_padding_mask=torch.from_numpy(
                        batch_np["input_mask"])).numpy()

    valid = ~batch_np["output_mask"][:, :S]
    np.testing.assert_allclose(mine_h[valid], ref_h[valid], atol=3e-5)

    # --- mixed distribution + NLL loss parity (`models.py:140-166,221`) ---
    dists = np.asarray(train_dists(params, jnp.asarray(mine_h), DIMS))

    hp = params["heads"]
    h = torch.from_numpy(ref_h)
    vocab_logits = h @ t(hp["vocab"]["w"]) + t(hp["vocab"]["b"])
    feature = h @ t(hp["pointer"]["w"]) + t(hp["pointer"]["b"])
    pointer_logits = torch.bmm(feature, h.transpose(1, 2)) / DIMS.num_model
    prob = torch.sigmoid(h @ t(hp["switch"]["w"]) + t(hp["switch"]["b"]))
    eps = 1e-6
    vocab_dists = F.log_softmax(vocab_logits, dim=-1)
    triu = torch.triu(torch.ones(S, S)) == 1
    pointer_logits = pointer_logits.masked_fill(triu.unsqueeze(0), eps)
    pointer_dists = F.log_softmax(pointer_logits, dim=-1)
    vocab_dists = vocab_dists + torch.log(torch.clamp(1 - prob, min=eps))
    pointer_dists = pointer_dists + torch.log(torch.clamp(prob, min=eps))
    ref_dists = torch.cat([vocab_dists, pointer_dists], dim=-1)

    valid_pos = ~batch_np["output_mask"][:, :S]
    np.testing.assert_allclose(dists[valid_pos],
                               ref_dists.numpy()[valid_pos], atol=3e-5)

    ref_loss = F.nll_loss(ref_dists.transpose(1, 2),
                          torch.from_numpy(batch_np["output_label"]),
                          ignore_index=CFG.TOKEN.PAD)
    my_loss, _ = train_step_loss(params, batch, DIMS, deterministic=True,
                                 compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), atol=3e-5)
