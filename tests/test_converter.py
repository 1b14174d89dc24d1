"""Round-trip test: torch state_dict (built from our params via the parity
harness) -> convert_state_dict -> identical pytree, and the converted params
produce identical model outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from plankassembly_tpu.models.model import ModelDims, init_params, train_step_loss
from tests.test_torch_parity import build_torch_decoder, build_torch_encoder, t
from tests.tiny import random_batch, tiny_config

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_checkpoint import convert_state_dict  # noqa: E402

CFG = tiny_config()
DIMS = ModelDims.from_config(CFG)


def test_convert_round_trip():
    params = init_params(jax.random.PRNGKey(3), DIMS)

    # build a reference-shaped state_dict via the torch parity modules
    enc = build_torch_encoder(params)
    dec = build_torch_decoder(params)
    sd = {}
    for key, val in enc.state_dict().items():
        sd[f"model.encoder.{key}"] = val.numpy()
    for key, val in dec.state_dict().items():
        sd[f"model.decoder.{key}"] = val.numpy()
    emb = params["embed"]
    sd["model.input_embeddings.input_value.weight"] = np.asarray(emb["value"])
    sd["model.input_embeddings.input_pos.weight"] = np.asarray(emb["pos_in"])
    sd["model.input_embeddings.input_coord.weight"] = np.asarray(emb["coord_in"])
    sd["model.input_embeddings.input_view.weight"] = np.asarray(emb["view"])
    sd["model.input_embeddings.input_type.weight"] = np.asarray(emb["type"])
    sd["model.query_coord_embedding.weight"] = np.asarray(emb["coord_out"])
    sd["model.query_pos_embedding.weight"] = np.asarray(emb["pos_out"])
    hp = params["heads"]
    sd["model.vocab_head.weight"] = np.asarray(hp["vocab"]["w"]).T
    sd["model.vocab_head.bias"] = np.asarray(hp["vocab"]["b"])
    sd["model.pointer_head.weight"] = np.asarray(hp["pointer"]["w"]).T
    sd["model.pointer_head.bias"] = np.asarray(hp["pointer"]["b"])
    sd["model.switch_head.weight"] = np.asarray(hp["switch"]["w"]).T
    sd["model.switch_head.bias"] = np.asarray(hp["switch"]["b"])

    converted = convert_state_dict(sd, DIMS.num_encoder_layers,
                                   DIMS.num_decoder_layers)

    flat0, _ = jax.tree.flatten_with_path(params)
    flat1 = dict(jax.tree.flatten_with_path(converted)[0])
    flat1 = {jax.tree_util.keystr(k): v for k, v in flat1.items()}
    for path, val in flat0:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(val), flat1[key], atol=1e-6,
                                   err_msg=key)

    # converted params give identical loss
    batch = {k: jnp.asarray(v) for k, v in random_batch(CFG).items()}
    l0, _ = train_step_loss(params, batch, DIMS, deterministic=True,
                            compute_dtype=jnp.float32)
    l1, _ = train_step_loss(jax.tree.map(jnp.asarray, converted), batch, DIMS,
                            deterministic=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
