"""AOT serving artifacts: the whole serving program as one StableHLO blob.

The reference has no deployment story — serving means re-running the
Lightning eval loop (`plankassembly/models.py:267-323` driven by
`test_complete.py`) on a host that carries the full training stack: torch,
the model code, the checkpoint, the YAML config. The TPU-native design
inverts that: `jax.export` traces + lowers the complete encode->decode
program ONCE, with the trained weights baked in as StableHLO constants,
producing a single self-contained artifact. A serving host needs only a
compatible jaxlib runtime — no model code, no checkpoint plumbing, no
config — and XLA recompiles the same StableHLO identically on every host
(and, with `platforms=("cpu", "tpu")`, on either backend from one file).

Artifact format `PSRV1`: 6-byte magic, u64-le header length, JSON header,
`jax.export` serialization. The header records the serving contract
(batch/bucket/beam, token ids, input keys/dtypes) so a host can validate
and pad requests without any plankassembly code.

The exported program uses the portable XLA decode path (`cross_impl="mxu"`,
int8 cross/self-KV, early exit) — the Pallas persistent kernel is a
TPU-only lowering and benchmark-mode-only (no early exit), so it stays
out of serving artifacts.
"""
from __future__ import annotations

import json
import struct

import jax
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.config import Config
from plankassembly_tpu.models.model import ModelDims

_MAGIC = b"PSRV1\n"

# dtypes the serving contract fixes for each input (what the packed
# datasets / predict.py produce after jnp.asarray under 32-bit mode)
_INPUT_DTYPES = {
    "input_value": np.int32,
    "input_pos": np.int32,
    "input_coord": np.int32,
    "input_view": np.int32,
    "input_type": np.int32,
    "input_mask": np.bool_,
}


def serving_meta(dims, *, batch: int, bucket: int, beam: int = 0,
                 platforms=("cpu",), compute_dtype=jnp.bfloat16,
                 early_exit: bool = True, weight_quant: bool = False,
                 data_parallel: int = 1, with_type: bool = True) -> dict:
    """The serving contract header — ONE construction shared by artifacts
    (`export_serving`) and live checkpoint backends
    (`serving.make_live_backend`), so the two can never drift.

    with_type=False is the sideface modality's input contract: it packs
    no line-type stream (`data/sideface_data.py:206`, reference
    `sideface_data.py:179-185`), and `encode` only adds the type
    embedding when the key is present."""
    keys = {k: v for k, v in _INPUT_DTYPES.items()
            if with_type or k != "input_type"}
    return {
        "format": "PSRV1",
        "batch": batch,
        "bucket": bucket,
        "beam": beam,
        "platforms": list(platforms),
        "early_exit": bool(early_exit and beam < 2),
        "weight_quant": bool(weight_quant),
        "data_parallel": data_parallel,
        "with_type": bool(with_type),
        "compute_dtype": jnp.dtype(compute_dtype).name,
        "input_keys": sorted(keys),
        "input_dtypes": {k: np.dtype(v).name for k, v in keys.items()},
        "max_output_length": dims.max_output_length,
        "num_output_dof": dims.num_output_dof,
        "token_end": dims.end,
        "token_pad": dims.pad,
        "vocab_size": dims.vocab_size,
        "num_model": dims.num_model,
        "kv_heads": dims.kv_heads,
    }


def export_serving(params, cfg: Config, *, batch: int, bucket: int,
                   beam: int = 0, platforms=("cpu", "tpu"),
                   compute_dtype=jnp.bfloat16, early_exit: bool = True,
                   weight_quant: bool = False, data_parallel: int = 1,
                   with_type: bool = True):
    """Trace + serialize the serving program. Returns (blob, meta).

    batch/bucket fix the compiled shapes (static shapes are the TPU
    contract); `beam >= 2` exports the beam-search decoder instead of
    greedy. Weights are closed over, so they serialize as constants;
    `weight_quant=True` bakes the decoder/head weights as int8 constants
    with in-loop dequant (~2x smaller artifact, ~2x less per-step weight
    HBM traffic — the dominant stream at small serving batches).

    data_parallel > 1 exports an SPMD program: the batch axis shards over
    a `data_parallel`-device ('data',) mesh (weights replicate; decode is
    row-independent, so there are no cross-device collectives on the hot
    path). The one artifact then drives a whole serving pod — loading it
    requires exactly `data_parallel` visible devices."""
    dims = ModelDims.from_config(cfg)
    if batch % data_parallel:
        raise ValueError(f"batch {batch} must divide over "
                         f"data_parallel={data_parallel}")
    if data_parallel > len(jax.devices()):
        # Mesh(jax.devices()[:dp]) would silently build a smaller mesh
        # while the header promised dp — a confusing failure on the
        # serving host instead of here
        raise ValueError(f"data_parallel={data_parallel} needs that many "
                         f"visible devices to trace; have "
                         f"{len(jax.devices())}")
    if bucket > cfg.DATA.MAX_INPUT_LENGTH - 1:
        raise ValueError(
            f"bucket {bucket} exceeds the model's trained input width "
            f"{cfg.DATA.MAX_INPUT_LENGTH - 1}")
    params = jax.tree.map(jnp.asarray, params)
    if weight_quant:
        # quantize OUT OF TRACE so the int8 tensors (not the f32
        # originals) are what serializes into the StableHLO constants —
        # this is where the ~2x artifact-size cut comes from. Both decode
        # loops consume the pre-quantized form directly.
        from plankassembly_tpu.decode import quantize_decoder_weights
        params = quantize_decoder_weights(params)

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
            out = greedy_decode(params, inputs, dims,
                                compute_dtype=compute_dtype,
                                early_exit=early_exit, kv_bucket=bucket,
                                kv_quant=True, cross_impl="mxu")
            return {"samples": out["samples"], "attach": out["attach"],
                    "num_steps": out["num_steps"]}

    in_dtypes = {k: v for k, v in _INPUT_DTYPES.items()
                 if with_type or k != "input_type"}
    if data_parallel > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()[:data_parallel]), ("data",))
        row = NamedSharding(mesh, P("data"))
        specs = {k: jax.ShapeDtypeStruct((batch, bucket), dt, sharding=row)
                 for k, dt in in_dtypes.items()}
        out_sh = {"samples": row, "attach": row,
                  "num_steps": NamedSharding(mesh, P())}
        jit_fn = jax.jit(fn, out_shardings=out_sh)
    else:
        specs = {k: jax.ShapeDtypeStruct((batch, bucket), dt)
                 for k, dt in in_dtypes.items()}
        jit_fn = jax.jit(fn)
    exported = jax.export.export(jit_fn, platforms=list(platforms))(specs)
    meta = serving_meta(dims, batch=batch, bucket=bucket, beam=beam,
                        platforms=platforms, compute_dtype=compute_dtype,
                        early_exit=early_exit, weight_quant=weight_quant,
                        data_parallel=data_parallel, with_type=with_type)
    return exported.serialize(), meta


def save_artifact(path: str, blob: bytes, meta: dict) -> None:
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)


def load_artifact(path: str) -> "ServingProgram":
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a PSRV1 serving artifact")
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode())
        blob = f.read()
    return ServingProgram(meta, jax.export.deserialize(blob))


def pad_request(batch: dict, meta: dict) -> tuple[dict, int]:
    """Validate + pad a request to the (batch, bucket) serving contract.

    Returns (padded arrays, real row count). Rows beyond the request are
    PAD tokens (mask=True); every batch row is independent in the decode
    program (per-row attention, layer norm, early-exit flags), so padding
    cannot perturb real rows — `tests/test_export_serving.py` asserts
    this bit-exactly. Width beyond the bucket is cropped only if fully
    masked (real tokens there mean the artifact's bucket is too small).
    """
    B, W = meta["batch"], meta["bucket"]
    arrays = {k: np.asarray(batch[k]) for k in meta["input_keys"]}
    rows = arrays["input_value"].shape[0]
    if rows > B:
        raise ValueError(f"request has {rows} rows; program compiled "
                         f"for batch {B} (split the request)")
    width = arrays["input_value"].shape[1]
    if width > W:
        mask = np.asarray(arrays["input_mask"][:, W:], bool)
        if not mask.all():
            raise ValueError(
                f"request has real tokens beyond the exported bucket "
                f"{W} (width {width}); re-export with a larger bucket")
        arrays = {k: v[:, :W] for k, v in arrays.items()}
    padded = {}
    for k, v in arrays.items():
        dt = np.dtype(meta["input_dtypes"][k])
        full = np.full((B, W), meta["token_pad"] if k == "input_value"
                       else (True if k == "input_mask" else 0),
                       dtype=dt)
        full[:rows, :v.shape[1]] = v.astype(dt)
        padded[k] = full
    return padded, rows


class ServingProgram:
    """A loaded artifact: validates/pads a request and runs the program."""

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self.exported = exported
        self._row_sharding = None
        dp = meta.get("data_parallel", 1)
        if dp > 1:
            # an SPMD artifact must be invoked in a dp-device context:
            # requests shard their batch axis over the first dp devices
            # (the mesh layout the program was exported with). Build the
            # mesh/sharding ONCE — per-call construction would put six
            # fresh transfers on the hot path every request.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            if len(jax.devices()) < dp:
                raise ValueError(
                    f"artifact was exported for {dp} devices; "
                    f"{len(jax.devices())} visible")
            mesh = Mesh(np.array(jax.devices()[:dp]), ("data",))
            self._row_sharding = NamedSharding(mesh, PartitionSpec("data"))

    def __call__(self, batch: dict) -> dict:
        padded, rows = pad_request(batch, self.meta)
        if self._row_sharding is not None:
            padded = {k: jax.device_put(v, self._row_sharding)
                      for k, v in padded.items()}
        out = self.exported.call(padded)
        return {k: np.asarray(v)[:rows] if np.ndim(v) else np.asarray(v)
                for k, v in out.items()}
