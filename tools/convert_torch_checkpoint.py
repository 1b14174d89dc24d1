#!/usr/bin/env python
"""Convert a reference PyTorch-Lightning checkpoint into this framework's
parameter pytree (orbax directory).

The reference publishes trained .ckpt files on HuggingFace (`README.md:
152-156`); converting them lets us validate F1 parity (0.938 complete /
0.847 visible / 0.939 sideface) without retraining. Key mapping follows the
reference module tree (`plankassembly/models.py:47-74`): Lightning prefixes
everything with ``model.``; torch Linear weights are (out, in) so they
transpose; MultiheadAttention packs QKV into in_proj_weight rows.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _a(x):
    return np.asarray(x, dtype=np.float32)


def convert_state_dict(sd: dict, num_encoder_layers=6, num_decoder_layers=6):
    """Map a reference state_dict (numpy arrays or torch tensors) to the
    `models.model.init_params` pytree layout (layer-stacked)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = "model."

    embed = {
        "value": _a(sd[p + "input_embeddings.input_value.weight"]),
        "pos_in": _a(sd[p + "input_embeddings.input_pos.weight"]),
        "coord_in": _a(sd[p + "input_embeddings.input_coord.weight"]),
        "view": _a(sd[p + "input_embeddings.input_view.weight"]),
        "type": _a(sd[p + "input_embeddings.input_type.weight"]),
        "coord_out": _a(sd[p + "query_coord_embedding.weight"]),
        "pos_out": _a(sd[p + "query_pos_embedding.weight"]),
    }

    def attn(prefix, layers, torch_name):
        wq, wk, wv, wo = [], [], [], []
        bq, bk, bv, bo = [], [], [], []
        for i in range(layers):
            w = sd[f"{prefix}.layers.{i}.{torch_name}.in_proj_weight"]
            b = sd[f"{prefix}.layers.{i}.{torch_name}.in_proj_bias"]
            d = w.shape[1]
            wq.append(_t(w[:d])); wk.append(_t(w[d:2 * d])); wv.append(_t(w[2 * d:]))
            bq.append(_a(b[:d])); bk.append(_a(b[d:2 * d])); bv.append(_a(b[2 * d:]))
            wo.append(_t(sd[f"{prefix}.layers.{i}.{torch_name}.out_proj.weight"]))
            bo.append(_a(sd[f"{prefix}.layers.{i}.{torch_name}.out_proj.bias"]))
        return {"wq": np.stack(wq), "wk": np.stack(wk), "wv": np.stack(wv),
                "wo": np.stack(wo), "bq": np.stack(bq), "bk": np.stack(bk),
                "bv": np.stack(bv), "bo": np.stack(bo)}

    def ffn(prefix, layers):
        return {
            "w1": np.stack([_t(sd[f"{prefix}.layers.{i}.linear1.weight"])
                            for i in range(layers)]),
            "b1": np.stack([_a(sd[f"{prefix}.layers.{i}.linear1.bias"])
                            for i in range(layers)]),
            "w2": np.stack([_t(sd[f"{prefix}.layers.{i}.linear2.weight"])
                            for i in range(layers)]),
            "b2": np.stack([_a(sd[f"{prefix}.layers.{i}.linear2.bias"])
                            for i in range(layers)]),
        }

    def norm(prefix, layers, name):
        return {
            "scale": np.stack([_a(sd[f"{prefix}.layers.{i}.{name}.weight"])
                               for i in range(layers)]),
            "bias": np.stack([_a(sd[f"{prefix}.layers.{i}.{name}.bias"])
                              for i in range(layers)]),
        }

    def final_norm(prefix):
        return {"scale": _a(sd[f"{prefix}.norm.weight"]),
                "bias": _a(sd[f"{prefix}.norm.bias"])}

    enc = p + "encoder"
    encoder = {
        "self_attn": attn(enc, num_encoder_layers, "self_attn"),
        "ffn": ffn(enc, num_encoder_layers),
        "norm1": norm(enc, num_encoder_layers, "norm1"),
        "norm2": norm(enc, num_encoder_layers, "norm2"),
        "final_norm": final_norm(enc),
    }
    dec = p + "decoder"
    decoder = {
        "self_attn": attn(dec, num_decoder_layers, "self_attn"),
        "cross_attn": attn(dec, num_decoder_layers, "multihead_attn"),
        "ffn": ffn(dec, num_decoder_layers),
        "norm1": norm(dec, num_decoder_layers, "norm1"),
        "norm2": norm(dec, num_decoder_layers, "norm2"),
        "norm3": norm(dec, num_decoder_layers, "norm3"),
        "final_norm": final_norm(dec),
    }
    heads = {
        "vocab": {"w": _t(sd[p + "vocab_head.weight"]),
                  "b": _a(sd[p + "vocab_head.bias"])},
        "pointer": {"w": _t(sd[p + "pointer_head.weight"]),
                    "b": _a(sd[p + "pointer_head.bias"])},
        "switch": {"w": _t(sd[p + "switch_head.weight"]),
                   "b": _a(sd[p + "switch_head.bias"])},
    }
    return {"embed": embed, "encoder": encoder, "decoder": decoder,
            "heads": heads}


def main(args):
    import torch

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = convert_state_dict(sd, args.encoder_layers, args.decoder_layers)

    import jax
    import orbax.checkpoint as ocp
    params = jax.tree.map(lambda x: np.asarray(x), params)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.out), {"params": params}, force=True)
    print(f"converted {args.ckpt} -> {args.out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="Lightning .ckpt path")
    parser.add_argument("--out", required=True, help="orbax output dir")
    parser.add_argument("--encoder_layers", type=int, default=6)
    parser.add_argument("--decoder_layers", type=int, default=6)
    main(parser.parse_args())
