"""wan2gp_tpu — a TPU-native (JAX/XLA/Pallas) generative-media framework.

A from-scratch rebuild of the capabilities of deepbeepmeep/Wan2GP ("WanGP"):
local inference for open video / image / audio generative models with a
headless CLI/API, per-model JSON configs, LoRA merging, quantized-checkpoint
loading, flow-matching samplers, CFG variants, step-skipping caches, and
sliding-window long-video generation.

Unlike the reference (single-GPU PyTorch + CPU<->VRAM paging), this framework
is idiomatic JAX: denoising loops are jit-compiled `lax.scan`s, attention /
RoPE / modulation run as fused Pallas TPU kernels, and models shard over a
`jax.sharding.Mesh` (data / context / tensor axes) so large DiTs stay
HBM-resident.
"""

__version__ = "0.1.0"
