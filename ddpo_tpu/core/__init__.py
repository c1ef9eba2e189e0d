from ddpo_tpu.core.scheduler import (
    DDIMScheduler,
    DDIMState,
    DDPMScheduler,
    make_betas,
)

__all__ = ["DDIMScheduler", "DDIMState", "DDPMScheduler", "make_betas"]
