from ddpo_tpu.sampling.sampler import (
    SamplerConfig,
    sample_images,
    sample_images_ode,
    sample_images_sharded,
    sample_trajectories,
    sample_trajectories_sharded,
    vae_decode,
)

__all__ = [
    "SamplerConfig",
    "sample_images",
    "sample_images_ode",
    "sample_images_sharded",
    "sample_trajectories",
    "sample_trajectories_sharded",
    "vae_decode",
]
