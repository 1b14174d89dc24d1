"""Release-checkpoint export/import round-trip (tools/export_checkpoint.py):
orbax -> bf16 npz -> orbax preserves parameters exactly (modulo the bf16
cast) and restores a trainable state with a fresh optimizer."""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.models.model import ModelDims, init_params
from plankassembly_tpu.train.state import init_state, make_optimizer
from tests.tiny import tiny_config


def test_export_import_roundtrip(tmp_path):
    import orbax.checkpoint as ocp

    from tools.export_checkpoint import do_export, do_import

    dims = ModelDims.from_config(tiny_config())
    params = init_params(jax.random.PRNGKey(0), dims)
    opt = make_optimizer(1e-4)
    state = init_state(params, opt)
    ckpt = tmp_path / "run" / "checkpoints" / "best"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.fspath(ckpt),
                   {"params": state.params, "opt_state": state.opt_state,
                    "step": 7})

    npz = tmp_path / "rel" / "tiny.npz"
    do_export(argparse.Namespace(ckpt=os.fspath(ckpt), out=os.fspath(npz)))
    assert npz.exists()

    out = tmp_path / "reimport"
    do_import(argparse.Namespace(npz=os.fspath(npz), out=os.fspath(out),
                                 lr=1e-4))
    with ocp.StandardCheckpointer() as ckptr:
        back = ckptr.restore(os.fspath(out))
    assert int(np.asarray(back["step"])) == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back["params"])):
        np.testing.assert_array_equal(
            np.asarray(jnp.asarray(a).astype(jnp.bfloat16)
                       .astype(jnp.float32)), np.asarray(b))
    # optimizer state is freshly initialized and structurally valid
    assert jax.tree.structure(back["opt_state"]) is not None
