from ddpo_tpu.training import policy_gradient, diffusion, prompts, callbacks
from ddpo_tpu.training.policy_gradient import AccumulatingTrainState
from ddpo_tpu.training.prompts import make_prompts
from ddpo_tpu.training.callbacks import callback_fns, evaluate_callbacks
from ddpo_tpu.training.stat_tracking import PerPromptStatTracker

__all__ = [
    "policy_gradient",
    "diffusion",
    "prompts",
    "callbacks",
    "AccumulatingTrainState",
    "make_prompts",
    "callback_fns",
    "evaluate_callbacks",
    "PerPromptStatTracker",
]
