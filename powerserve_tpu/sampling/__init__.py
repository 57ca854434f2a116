from .sampler import (
    PenaltyState,
    apply_repeat_penalty,
    apply_top_k,
    apply_top_p,
    draft_probs,
    greedy_sample,
    sample_logits,
)

__all__ = [
    "PenaltyState", "apply_repeat_penalty", "apply_top_k", "apply_top_p",
    "draft_probs", "greedy_sample", "sample_logits",
]
