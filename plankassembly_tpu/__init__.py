"""PlankAssembly-TPU: a TPU-native JAX framework for robust 3D reconstruction
from three orthographic views with learnt shape programs.

A ground-up rebuild of manycore-research/PlankAssembly (ICCV 2023) designed
for TPU hardware: static-shape token pipelines, a pure-JAX transformer with
a pointer network, KV-cached autoregressive decoding under
`jax.lax.while_loop` (greedy + beam; int8 KV and weight quantization),
Pallas fused-attention kernels, on-device batched Hungarian-style matching,
pjit data/tensor parallelism over a `jax.sharding.Mesh`, and a deployment
layer (`export`/`serving`): AOT StableHLO artifacts + dynamic-batching
HTTP serving.

Reference behavioral contract: /root/reference (PlankAssembly @ 2024-12-20).
"""

__version__ = "0.1.0"

from plankassembly_tpu import tokens  # noqa: F401
from plankassembly_tpu.config import Config, load_config  # noqa: F401
