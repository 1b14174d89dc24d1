"""Online serving (`plankassembly_tpu/serving.py`, `tools/serve.py`).

Semantic anchors:
- a BatchingServer row equals the direct `greedy_decode` row bit-exactly
  (the dynamic batcher's padding is inert);
- concurrent HTTP requests share one compiled program call
  (`batched_rows` > 1) — the fixed-shape multiplexing that makes online
  serving recompile-free;
- the HTTP contract: prepare_info-style JSON in, planks + attach out,
  errors as 4xx/5xx JSON rather than a dead connection.
"""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.decode import greedy_decode
from plankassembly_tpu.models.model import ModelDims, init_params
from plankassembly_tpu.serving import (
    BatchingServer, make_http_server, make_live_backend, pack_info_dict,
    postprocess_prediction,
)
from tests.tiny import random_batch, tiny_config

BUCKET = 31


def _tiny_info(seed=0, n=7):  # 7 lines * 4 dof + END = 29 <= tiny Li 31
    rng = np.random.default_rng(seed)
    lo = rng.uniform(-1, 0, (n, 2))
    hi = lo + rng.uniform(0.05, 0.9, (n, 2))
    lines = np.concatenate([lo, np.minimum(hi, 0.999)], axis=1)
    return {"name": f"tiny{seed}",
            "lines": lines.round(3).tolist(),
            "views": (np.arange(n) % 3).tolist(),
            "types": (np.arange(n) % 2).tolist()}


@pytest.fixture(scope="module")
def served():
    cfg = tiny_config()
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    backend, meta = make_live_backend(
        params, cfg, batch=2, bucket=BUCKET, compute_dtype=jnp.float32,
        cross_impl="mxu")
    server = BatchingServer(backend, meta, max_wait_ms=300.0)
    httpd = make_http_server(server, cfg, dims, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield cfg, dims, params, server, base
    httpd.shutdown()
    server.close()


def _post(base, path, obj, timeout=240):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_batcher_matches_direct_decode(served):
    cfg, dims, params, server, base = served
    batch = random_batch(cfg)
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    row = server.submit({k: v[0] for k, v in inputs.items()})
    want = greedy_decode(params,
                         {k: jnp.asarray(v[:1]) for k, v in inputs.items()},
                         dims, compute_dtype=jnp.float32, kv_bucket=BUCKET,
                         kv_quant=True, cross_impl="mxu")
    np.testing.assert_array_equal(row["samples"],
                                  np.asarray(want["samples"])[0])
    np.testing.assert_array_equal(row["attach"],
                                  np.asarray(want["attach"])[0])


def test_http_reconstruct_and_health(served):
    cfg, dims, params, server, base = served
    code, out = _post(base, "/v1/reconstruct", _tiny_info(1))
    assert code == 200, out
    assert out["name"] == "tiny1"
    pred = np.asarray(out["prediction"])
    assert pred.ndim == 2 and pred.shape[1] == dims.num_output_dof
    assert len(out["attach"]) == len(out["prediction"])
    # response prediction equals the offline pipeline on the same input
    sample = pack_info_dict(_tiny_info(1), cfg)
    row = server.submit({k: v for k, v in sample.items()
                         if k.startswith("input")})
    want_pred, want_attach = postprocess_prediction(
        row["samples"], row["attach"], dims)
    np.testing.assert_array_equal(pred, want_pred)
    assert out["attach"] == want_attach

    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        health = json.loads(r.read().decode())
    assert health["ok"] and health["rows_served"] >= 1
    with urllib.request.urlopen(base + "/meta", timeout=30) as r:
        meta = json.loads(r.read().decode())
    assert meta["batch"] == 2 and meta["bucket"] == BUCKET


def test_concurrent_requests_share_a_batch(served):
    cfg, dims, params, server, base = served
    results = [None, None]

    def hit(i):
        results[i] = _post(base, "/v1/reconstruct", _tiny_info(10 + i))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    rows = [r[1]["batched_rows"] for r in results if r and r[0] == 200]
    assert len(rows) == 2, results
    assert max(rows) == 2, "requests arriving within max_wait must batch"


def test_http_errors(served):
    cfg, dims, params, server, base = served
    code, out = _post(base, "/v1/bogus", {})
    assert code == 404
    code, out = _post(base, "/v1/reconstruct", {"views": [0]})  # no lines/svgs
    assert code == 500 and "error" in out


def test_invalid_request_does_not_poison_batchmates(served):
    """A request whose real tokens exceed the bucket must fail ALONE at
    submit time — a valid concurrent request sharing its batching window
    still gets served (the review finding: batch-level validation fanned
    one bad request's error out to every waiter)."""
    cfg, dims, params, server, base = served
    import dataclasses
    wide = dataclasses.replace(
        cfg, DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=64))
    long_sample = pack_info_dict(_tiny_info(5, n=12), wide)  # 49 tokens
    results = [None, None]

    def bad():
        try:
            server.submit({k: v for k, v in long_sample.items()
                           if k.startswith("input")})
            results[0] = "no error"
        except ValueError as e:
            results[0] = str(e)

    def good():
        results[1] = _post(base, "/v1/reconstruct", _tiny_info(6))

    threads = [threading.Thread(target=bad), threading.Thread(target=good)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert "beyond the exported bucket" in results[0]
    assert results[1][0] == 200, results[1]


def test_sideface_request_packing_matches_dataset(tmp_path):
    """pack_info_dict(with_type=False) must run the SAME side-face
    derivation the SidefaceDataset applies — a sideface model then serves
    from ordinary info JSONs with no special request format."""
    import dataclasses
    import os

    from plankassembly_tpu.data.sideface_data import SidefaceDataset
    from tests.tiny import tiny_config, write_tiny_dataset

    root = str(tmp_path)
    names = write_tiny_dataset(root)
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=320,
                                      MAX_OUTPUT_LENGTH=48))
    ds = SidefaceDataset(os.path.join(root, "infos"),
                         [f"{n}.json" for n in names], cfg)
    want = ds[0]
    with open(os.path.join(root, "infos", f"{names[0]}.json")) as f:
        info = json.load(f)
    got = pack_info_dict(info, cfg, with_type=False)
    assert "input_type" not in got
    for k, v in got.items():
        np.testing.assert_array_equal(v, want[k], err_msg=k)


def test_bucket_router_routes_by_real_tokens(tmp_path):
    """A bucket ladder (31, 63) from ONE model: short requests land in
    the small program, long ones in the big program, both bit-exact vs
    direct decode; requests beyond the ladder fail with a clear error."""
    import dataclasses

    from plankassembly_tpu.export import (
        ServingProgram, export_serving, load_artifact, save_artifact,
    )
    from plankassembly_tpu.serving import BucketRouter

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=64))
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    servers = []
    for bucket in (31, 63):
        blob, meta = export_serving(params, cfg, batch=2, bucket=bucket,
                                    platforms=("cpu",),
                                    compute_dtype=jnp.float32)
        p = str(tmp_path / f"b{bucket}.psrv")
        save_artifact(p, blob, meta)
        servers.append(BatchingServer(load_artifact(p),
                                      load_artifact(p).meta,
                                      max_wait_ms=1.0))
    router = BucketRouter(servers)
    assert router.meta["buckets"] == [31, 63]

    short = pack_info_dict(_tiny_info(2), cfg)        # 29 real tokens
    out_s = router.submit({k: v for k, v in short.items()
                           if k.startswith("input")})
    assert out_s["bucket"] == 31
    long = pack_info_dict(_tiny_info(3, n=14), cfg)   # 57 real tokens
    out_l = router.submit({k: v for k, v in long.items()
                           if k.startswith("input")})
    assert out_l["bucket"] == 63

    # routed results equal direct decode at the routed bucket
    want = greedy_decode(params,
                         {k: jnp.asarray(v[None]) for k, v in long.items()
                          if k.startswith("input")},
                         dims, compute_dtype=jnp.float32, kv_bucket=63,
                         kv_quant=True, cross_impl="mxu")
    np.testing.assert_array_equal(out_l["samples"],
                                  np.asarray(want["samples"])[0])

    over = {k: v for k, v in pack_info_dict(_tiny_info(4, n=15),
                                            cfg).items()
            if k.startswith("input")}                 # 61 real tokens... fits
    with pytest.raises(ValueError, match="largest bucket"):
        wide_cfg = dataclasses.replace(
            cfg, DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=128))
        too_long = pack_info_dict(_tiny_info(5, n=17), wide_cfg)  # 69 real
        router.submit({k: v for k, v in too_long.items()
                       if k.startswith("input")})
    router.close()


def test_submit_after_close_rejected():
    cfg = tiny_config()
    dims = ModelDims.from_config(cfg)
    meta = {"batch": 1, "bucket": BUCKET, "token_pad": dims.pad,
            "token_end": dims.end, "input_keys": ["input_value",
                                                  "input_mask"]}
    server = BatchingServer(lambda req: req, meta, max_wait_ms=1.0)
    server.close()
    with pytest.raises(RuntimeError, match="closed"):
        server.submit({"input_value": np.zeros(4, np.int32),
                       "input_mask": np.ones(4, bool)})
