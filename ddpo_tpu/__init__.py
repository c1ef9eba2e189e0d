"""ddpo_tpu: TPU-native framework for RL finetuning of diffusion models.

From-scratch rebuild of the capabilities of jannerm/ddpo (DDPO clipped policy
gradient + reward-weighted regression over Stable Diffusion v1.4), designed
TPU-first: first-party Flax models with Pallas kernels for the hot ops, a
jax.lax.scan DDIM sampler that tracks per-step log-probs on device, and
mesh-based parallelism via jit/NamedSharding instead of pmap+replicate.
"""

__version__ = "0.1.0"

from ddpo_tpu import core

__all__ = ["core", "__version__"]
