"""Multi-host (DCN) correctness: 2 processes x 4 virtual CPU devices.

Reference anchor: the rebuild of Lightning DDP + torchmetrics cross-rank
sync (`configs/train_complete.yaml:18-21`, `plankassembly/metric.py:13-16`)
for the multi-slice case (SURVEY.md §5.8). Each test spawns two coordinated
`jax.distributed` processes with gloo CPU collectives and compares against a
single-process 8-device run of the identical computation:

- fit: 2-process dp training (process-sharded loading, global grad psum)
  must produce the same losses as single-process;
- validate/test: global metric reduction must match, prediction JSONs are
  written disjointly by row owner and reassemble the full split.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(num_procs: int, tmpdir: str, timeout: int = 540,
         retries: int = 1) -> dict:
    """Launch the worker under `num_procs` coordinated processes; return the
    merged result JSONs keyed by process id.

    One retry on failure, covering the two load-flake modes this
    single-core container produces under concurrent background jobs
    (neither is a product failure — the same run passes in isolation):

    - rendezvous skew: Gloo's CPU-collective context init has a fixed
      ~30 s window, and load can skew the two workers' first-collective
      arrival past it (GetKeyValue DEADLINE_EXCEEDED);
    - wall-clock starvation: the workers are alive but compile-bound and
      blow the subprocess timeout — `communicate` raises TimeoutExpired,
      which must be caught HERE (it used to escape before the retry
      could fire); the retry doubles the window."""
    env_base = dict(os.environ)
    env_base.pop("_PLANK_DRYRUN_CHILD", None)
    env_base["XLA_FLAGS"] = " ".join(
        f for f in env_base.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    port = _free_port()
    procs = []
    for pid in range(num_procs):
        env = dict(env_base)
        env["PLANK_TEST_NUM_PROCS"] = str(num_procs)
        env["PLANK_TEST_PROC_ID"] = str(pid)
        env["PLANK_TEST_PORT"] = str(port)
        env["PLANK_TEST_OUT"] = os.path.join(tmpdir, f"result_{pid}.json")
        env["PLANK_TEST_LOGDIR"] = os.path.join(tmpdir, "run")
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    try:
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        if not retries:
            raise
        return _run(num_procs, tmpdir, timeout * 2, retries - 1)
    if retries and any(p.returncode != 0 for p in procs):
        return _run(num_procs, tmpdir, timeout, retries - 1)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = {}
    for pid in range(num_procs):
        with open(os.path.join(tmpdir, f"result_{pid}.json")) as f:
            results[pid] = json.load(f)
    return results


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    single_dir = str(tmp_path_factory.mktemp("single"))
    multi_dir = str(tmp_path_factory.mktemp("multi"))
    single = _run(1, single_dir)
    multi = _run(2, multi_dir)
    return single, multi, single_dir, multi_dir


def test_losses_match_single_process(runs):
    single, multi, *_ = runs
    np.testing.assert_allclose(single[0]["losses"], multi[0]["losses"],
                               rtol=2e-5)
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=0)  # replicated scalars agree exactly


def test_validate_metrics_globally_reduced(runs):
    single, multi, *_ = runs
    np.testing.assert_allclose(single[0]["val"], multi[0]["val"], rtol=1e-6)
    np.testing.assert_allclose(multi[0]["val"], multi[1]["val"], rtol=0)


def test_pred_jsons_disjoint_and_complete(runs):
    single, multi, single_dir, multi_dir = runs
    single_names = set(single[0]["pred_files"])
    both = [set(multi[p]["pred_files"]) for p in (0, 1)]
    assert both[0] and both[1], "each process must write some preds"
    written = sorted(os.listdir(os.path.join(multi_dir, "run", "pred_jsons")))
    assert set(written) == single_names
    assert multi[0]["test"] == pytest.approx(single[0]["test"], rel=1e-6)


def test_rank0_only_logging(runs):
    _, multi, _, multi_dir = runs
    assert multi[0]["wrote_metrics_jsonl"] is True
    assert multi[1]["wrote_metrics_jsonl"] is False
