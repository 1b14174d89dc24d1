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


def torch_embed_output(params, output):
    """Reference `_embed_output` (`models.py:114-138`): value+coord+pos
    embeddings of the prefix, with a zero-vector BOS row prepended."""
    emb = params["embed"]
    B, n = output.shape
    value = t(np.asarray(params["embed"]["value"]))[output]
    coords = torch.remainder(torch.arange(n), 6)
    pos = torch.div(torch.arange(n), 6, rounding_mode="floor")
    x = (value + t(np.asarray(emb["coord_out"]))[coords].unsqueeze(0)
         + t(np.asarray(emb["pos_out"]))[pos].unsqueeze(0))
    zero = torch.zeros((B, 1, D))
    return torch.cat((zero, x), dim=1)


def torch_pointer_mask(sz):
    """Reference `_generate_pointer_mask` (`models.py:91-101`)."""
    switch = [3, 4, 5, 0, 1, 2]
    p2p = torch.eye(6)[switch]
    n = (sz + 5) // 6 + 1
    mask = p2p.repeat(n, n)
    mask[:, :6] = torch.eye(6).repeat(n, 1)[: mask.shape[0]]
    mask[:6, :] = 0
    return mask[:sz, :sz]


def torch_eval_step(params, batch_np, dims):
    """Faithful torch reimplementation of the reference greedy eval loop
    (`models.py:267-323`): full-prefix decoder re-run each step, eval-branch
    `_create_dist` (softmax, sz<6 vocab-only, -inf triu fill, eps structural
    fill), `_sample` pointer-copy, global all-END early exit."""
    enc = build_torch_encoder(params)
    dec = build_torch_decoder(params)
    hp = params["heads"]
    eps = 1e-6

    in_mask = torch.from_numpy(batch_np["input_mask"])
    memory = enc(torch_embed_input(params, batch_np),
                 src_key_padding_mask=in_mask)
    B = memory.shape[0]
    output = torch.empty((B, 0), dtype=torch.long)
    attach = torch.empty((B, 0), dtype=torch.long)

    for _ in range(dims.max_output_length):
        x = torch_embed_output(params, output)
        sz = output.shape[1] + 1
        tgt_mask = torch.triu(torch.full((sz, sz), float("-inf")), diagonal=1)
        h = dec(x, memory, tgt_mask=tgt_mask,
                memory_key_padding_mask=in_mask)

        vocab_logits = h @ t(hp["vocab"]["w"]) + t(hp["vocab"]["b"])
        vocab_dists = F.softmax(vocab_logits, dim=-1)
        if sz < 6:
            dists = vocab_dists
        else:
            feature = h @ t(hp["pointer"]["w"]) + t(hp["pointer"]["b"])
            plogits = torch.bmm(feature, h.transpose(1, 2)) / D
            prob = torch.sigmoid(h @ t(hp["switch"]["w"]) + t(hp["switch"]["b"]))
            triu = torch.triu(torch.ones(sz, sz)) == 1
            plogits = plogits.masked_fill(triu.unsqueeze(0), float("-inf"))
            pdists = F.softmax(plogits, dim=-1)
            vocab_dists = vocab_dists * (1 - prob)
            pdists = pdists * prob
            pmask = torch_pointer_mask(sz) == 0
            pdists = pdists.masked_fill(pmask.unsqueeze(0), eps)
            dists = torch.cat((vocab_dists, pdists), dim=-1)

        tokens = torch.argmax(dists[:, -1], -1, keepdim=True)
        pointers = torch.full_like(tokens, -1)
        is_ptr = tokens.flatten() >= DIMS.vocab_size
        if is_ptr.any():
            tok = tokens.flatten().clone()
            ptr = pointers.flatten().clone()
            bidx = torch.arange(B)
            ptr[is_ptr] = tok[is_ptr] - DIMS.vocab_size
            tok[is_ptr] = output[bidx[is_ptr], tok[is_ptr] - DIMS.vocab_size]
            tokens, pointers = tok.unsqueeze(1), ptr.unsqueeze(1)
        output = torch.cat((output, tokens), dim=1)
        attach = torch.cat((attach, pointers), dim=1)
        if torch.all(torch.any(output == CFG.TOKEN.END, dim=1)):
            break
    return output.numpy(), attach.numpy()


def test_eval_step_token_parity(setup):
    """Greedy decode token-for-token vs the torch reference loop — the
    end-to-end inference-semantics anchor (VERDICT r1 #4b)."""
    from plankassembly_tpu.decode import greedy_decode

    params, batch_np, batch = setup
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    with torch.no_grad():
        ref_out, ref_att = torch_eval_step(params, batch_np, DIMS)

    for impl in ("xla", "mxu"):
        mine = greedy_decode(params, inputs, DIMS,
                             compute_dtype=jnp.float32, cross_impl=impl)
        steps = int(np.asarray(mine["num_steps"]))
        assert steps == ref_out.shape[1], (steps, ref_out.shape[1])
        np.testing.assert_array_equal(
            np.asarray(mine["samples"])[:, :steps], ref_out)
        np.testing.assert_array_equal(
            np.asarray(mine["attach"])[:, :steps], ref_att)
