"""Online serving: dynamic batching + HTTP front-end over a decode backend.

The reference has no serving path at all — reconstruction means running
`test_complete.py` (the Lightning eval loop) over a directory. This module
is the production half of the deployment story whose offline half is
`plankassembly_tpu/export.py`:

- a **backend** is any callable `inputs -> outputs` honoring the
  (batch, bucket) serving contract: a loaded `ServingProgram` artifact
  (no model code on the host) or a live jitted decode built from a
  checkpoint (`make_live_backend`);
- `BatchingServer` multiplexes concurrent single-sample requests onto the
  backend's fixed compiled batch (XLA's static-shape contract): the worker
  drains the queue up to `batch` rows or `max_wait_ms` after the first
  arrival, pads the tail, runs ONE program call, and fans results back
  out. Fixed shapes mean zero recompiles at any concurrency;
- `make_http_server` exposes it as a tiny stdlib HTTP service
  (`POST /v1/reconstruct` with the prepare_info JSON contract,
  `GET /healthz`, `GET /meta`).

CLI: `tools/serve.py`.
"""
from __future__ import annotations

import json
import queue
import threading
import time

import numpy as np

from plankassembly_tpu.export import pad_request, serving_meta


# ---------------------------------------------------------------------------
# request packing / response shaping (shared with tools/predict.py)
# ---------------------------------------------------------------------------

def pack_info_dict(info: dict, cfg, with_type: bool = True) -> dict:
    """Pack one prepare_info-contract dict (`lines`/`views`/`types`, or raw
    `svgs` GeoJSON) into the model's input streams (no GT keys needed).

    with_type=False is the sideface modality: the request's view SVGs run
    through the side-face extractor (polygonize -> thin-face detect ->
    colinear merge, `data/sideface_data.py`) and pack with no line-type
    stream — the same derivation the sideface dataset applies, so a
    sideface model serves from the ordinary info-JSON contract."""
    from plankassembly_tpu.data import geometry as geo
    from plankassembly_tpu.data.packing import pack_input_sequence

    if not with_type:
        from plankassembly_tpu.data.sideface_data import extract_sidefaces
        if "svgs" not in info:
            raise ValueError("sideface requests need 'svgs' (GeoJSON view "
                             "linestrings) — side faces are derived, not "
                             "given as lines")
        linestrings = [geo.from_geojson(s) for s in info["svgs"]]
        data = cfg.DATA
        faces, faceviews = extract_sidefaces(
            linestrings, np.asarray(info["views"]),
            data.MAX_THICKNESS / data.SCALE,
            data.MERGE_TOLERANCE / data.SCALE,
            data.MIN_THICKNESS / data.SCALE)
        return pack_input_sequence(faces, faceviews, None,
                                   cfg.DATA, cfg.TOKEN, with_type=False)
    if "lines" in info:
        lines = np.array(info["lines"], dtype=np.float64)
    else:
        lines = geo.bounds_many([geo.from_geojson(s) for s in info["svgs"]])
    return pack_input_sequence(
        lines, np.asarray(info["views"]), np.asarray(info["types"]),
        cfg.DATA, cfg.TOKEN, with_type=True)


def postprocess_prediction(sample_row, attach_row, dims):
    """Token row -> (planks ndarray (N,6) incl. bbox row, attach list).

    Mirrors the eval dump: `parse_sequence` + the zero-extent plank filter
    with the bbox row kept (reference `trainer_complete.py:100-101`)."""
    from plankassembly_tpu.decode import parse_sequence

    pred = parse_sequence(np.asarray(sample_row), dims)
    if len(pred) > 0:
        body = pred[1:]
        keep = np.all(np.abs(body[:, 3:] - body[:, :3]) != 0, axis=1)
        pred = np.concatenate([pred[:1], body[keep]])
    attach = np.asarray(attach_row)[: pred.size].reshape(-1, 6).tolist()
    return pred, attach


# ---------------------------------------------------------------------------
# backends
# ---------------------------------------------------------------------------

def make_live_backend(params, cfg, *, batch: int, bucket: int, beam: int = 0,
                      compute_dtype=None, cross_impl: str = "auto",
                      with_type: bool = True):
    """A jitted checkpoint-backed backend with the artifact's contract.

    Returns (backend callable, meta dict) — the same shape `load_artifact`
    gives, so `BatchingServer` treats them identically."""
    import jax
    import jax.numpy as jnp

    from plankassembly_tpu.models.model import ModelDims

    compute_dtype = compute_dtype or jnp.bfloat16
    dims = ModelDims.from_config(cfg)
    params = jax.tree.map(jnp.asarray, params)

    if beam >= 2:
        from plankassembly_tpu.beam import beam_decode

        def fn(inputs):
            out = beam_decode(params, inputs, dims, num_beams=beam,
                              compute_dtype=compute_dtype)
            return {"samples": out["samples"], "attach": out["attach"],
                    "num_steps": out["num_steps"]}
    else:
        from plankassembly_tpu.decode import greedy_decode

        def fn(inputs):
            return greedy_decode(params, inputs, dims,
                                 compute_dtype=compute_dtype,
                                 kv_bucket=bucket, kv_quant=True,
                                 cross_impl=cross_impl)

    jitted = jax.jit(fn)
    meta = serving_meta(dims, batch=batch, bucket=bucket, beam=beam,
                        platforms=(jax.default_backend(),),
                        compute_dtype=compute_dtype, with_type=with_type)

    def backend(request: dict) -> dict:
        padded, rows = pad_request(request, meta)
        out = jitted(padded)
        return {k: np.asarray(v)[:rows] if np.ndim(v) else np.asarray(v)
                for k, v in out.items()}

    return backend, meta


# ---------------------------------------------------------------------------
# dynamic batching
# ---------------------------------------------------------------------------

class BatchingServer:
    """Multiplex concurrent single-sample requests onto one compiled batch.

    submit() is thread-safe and blocks until the worker has run the
    sample's batch; results carry a `batched_rows` diagnostic (how many
    requests shared the program call)."""

    def __init__(self, backend, meta: dict, max_wait_ms: float = 10.0):
        self.backend = backend
        self.meta = meta
        self.max_wait = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self.batches_run = 0
        self.rows_served = 0

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        # fail anything still queued instead of leaving its waiter to
        # block out the full submit() timeout
        while True:
            try:
                _, done, slot = self._q.get_nowait()
            except queue.Empty:
                break
            slot["error"] = RuntimeError("serving backend closed")
            done.set()

    def submit(self, sample: dict, timeout: float = 300.0) -> dict:
        """sample: dict of (W,) per-sample input arrays. Returns the
        decoded row: samples/attach/num_steps + batched_rows.

        Validates the sample against the backend's (batch, bucket)
        contract HERE, per request — one bad request must not poison
        the batchmates it would share a program call with."""
        if self._stop.is_set():
            raise RuntimeError("serving backend closed")
        W = self.meta["bucket"]
        width = sample["input_value"].shape[0]
        if width > W and not np.asarray(sample["input_mask"][W:],
                                        bool).all():
            raise ValueError(
                f"request has real tokens beyond the exported bucket {W} "
                f"(width {width}); re-export with a larger bucket")
        done = threading.Event()
        slot: dict = {}
        self._q.put((sample, done, slot))
        if not done.wait(timeout):
            raise TimeoutError("serving backend did not answer in time")
        if "error" in slot:
            raise slot["error"]
        return slot

    def _worker(self):
        B = self.meta["batch"]
        while not self._stop.is_set():
            try:
                items = [self._q.get(timeout=0.1)]
            except queue.Empty:
                continue
            deadline = time.monotonic() + self.max_wait
            while len(items) < B:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                width = max(s["input_value"].shape[0] for s, _, _ in items)
                request = {
                    k: np.stack([
                        np.pad(s[k], (0, width - s[k].shape[0]),
                               constant_values=(
                                   self.meta["token_pad"]
                                   if k == "input_value" else
                                   True if k == "input_mask" else 0))
                        for s, _, _ in items])
                    for k in self.meta["input_keys"]}
                out = self.backend(request)
            except Exception as e:  # propagate to every waiter
                for _, done, slot in items:
                    slot["error"] = e
                    done.set()
                continue
            self.batches_run += 1
            self.rows_served += len(items)
            batch_steps = int(out["num_steps"])
            for i, (_, done, slot) in enumerate(items):
                row = np.asarray(out["samples"][i])
                slot["samples"] = row
                slot["attach"] = out["attach"][i]
                # per-ROW step count (first END), not the batch-global
                # early-exit bound a slow batchmate may have set
                ends = np.nonzero(row == self.meta["token_end"])[0]
                slot["num_steps"] = (int(ends[0]) + 1 if ends.size
                                     else batch_steps)
                slot["batched_rows"] = len(items)
                done.set()


class BucketRouter:
    """Route each request to the smallest serving bucket that fits it.

    The eval loop picks a per-batch KV bucket (`decode.pick_kv_bucket`) —
    the serving-time analogue is a small ladder of compiled programs
    (e.g. buckets 512 / 768 / 1152) with requests routed by their real
    token count. This closes the measured long-input gap: 33% of the
    synthetic test split exceeds 512 input tokens (max 1121), so a
    single bucket-512 program must reject a third of real traffic, while
    a ladder serves everything at near-minimal cross-attention cost.

    Exposes the same submit()/meta/close() surface as BatchingServer, so
    the HTTP front-end treats them identically.
    """

    def __init__(self, servers: list[BatchingServer]):
        if not servers:
            raise ValueError("BucketRouter needs at least one server")
        self.servers = sorted(servers, key=lambda s: s.meta["bucket"])
        buckets = [s.meta["bucket"] for s in self.servers]
        if len(set(buckets)) != len(buckets):
            raise ValueError(f"duplicate buckets in the ladder: {buckets}")
        for key in ("token_pad", "token_end", "input_keys", "with_type",
                    "max_output_length", "num_output_dof"):
            vals = {json.dumps(s.meta.get(key), sort_keys=True)
                    for s in self.servers}
            if len(vals) != 1:
                raise ValueError(
                    f"bucket ladder mixes incompatible programs: {key} "
                    f"differs across artifacts")
        self.meta = dict(self.servers[-1].meta)  # widest contract
        self.meta["buckets"] = buckets

    @property
    def batches_run(self):
        return sum(s.batches_run for s in self.servers)

    @property
    def rows_served(self):
        return sum(s.rows_served for s in self.servers)

    def submit(self, sample: dict, timeout: float = 300.0) -> dict:
        mask = np.asarray(sample["input_mask"], bool)
        n_real = int((~mask).sum())  # real tokens form a prefix (packing)
        for server in self.servers:
            if n_real <= server.meta["bucket"]:
                out = server.submit(sample, timeout=timeout)
                out["bucket"] = server.meta["bucket"]
                return out
        raise ValueError(
            f"request has {n_real} real tokens; largest bucket in the "
            f"ladder is {self.servers[-1].meta['bucket']} — re-export "
            f"with a larger bucket")

    def close(self):
        for s in self.servers:
            s.close()


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib only)
# ---------------------------------------------------------------------------

def make_http_server(server: BatchingServer, cfg, dims, port: int = 0):
    """ThreadingHTTPServer: POST /v1/reconstruct, GET /healthz, GET /meta."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    def reconstruct(info: dict) -> dict:
        sample = pack_info_dict(info, cfg,
                                with_type=server.meta.get("with_type",
                                                          True))
        t0 = time.perf_counter()
        row = server.submit({k: v for k, v in sample.items()
                             if k.startswith("input")})
        pred, attach = postprocess_prediction(
            row["samples"], row["attach"], dims)
        resp = {
            "name": info.get("name", "sample"),
            "prediction": pred.tolist(),
            "attach": attach,
            "num_steps": row["num_steps"],
            "batched_rows": row["batched_rows"],
            "latency_ms": round((time.perf_counter() - t0) * 1e3, 1),
        }
        if "bucket" in row:  # BucketRouter reports where it landed
            resp["bucket"] = row["bucket"]
        return resp

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True,
                                 "batches_run": server.batches_run,
                                 "rows_served": server.rows_served})
            elif self.path == "/meta":
                self._send(200, server.meta)
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/v1/reconstruct":
                self._send(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                info = json.loads(self.rfile.read(n).decode())
                self._send(200, reconstruct(info))
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving must not die
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
