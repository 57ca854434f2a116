"""Sampler chain tests vs straightforward numpy reference semantics
(reference src/sampler/sampler.cpp, sampler_chain.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from powerserve_tpu.core.config import SamplerConfig
from powerserve_tpu.sampling import (
    PenaltyState,
    apply_repeat_penalty,
    apply_top_k,
    apply_top_p,
    draft_probs,
    greedy_sample,
    sample_logits,
)


def test_top_k_masks_tail():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0
    assert (out[0, [0, 2, 3]] < -1e20).all()


def test_top_k_zero_disables():
    logits = jnp.asarray([[1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(apply_top_k(logits, 0)),
                                  np.asarray(logits))


def test_top_p_keeps_nucleus():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    out = np.asarray(apply_top_p(probs, 0.7))
    # 0.5 kept; cumsum-before(0.3)=0.5 < 0.7 -> kept; 0.15 excluded
    assert out[0, 0] == 0.5 and out[0, 1] == 0.3
    assert out[0, 2] == 0.0 and out[0, 3] == 0.0


def test_top_p_min_keep():
    probs = jnp.asarray([[0.99, 0.01]])
    out = np.asarray(apply_top_p(probs, 0.5, min_keep=1))
    assert out[0, 0] > 0


def test_repeat_penalty_matches_reference_semantics():
    cfg = SamplerConfig(penalty_repeat=2.0, penalty_freq=0.1,
                        penalty_present=0.5, penalty_last_n=8)
    state = PenaltyState.create(1, 8)
    for t in [1, 1, 3]:
        state = state.push(jnp.asarray([t]))
    logits = jnp.asarray([[1.0, 4.0, 2.0, -2.0]])
    out = np.asarray(apply_repeat_penalty(logits, state, cfg))
    # token 1 (twice): 4.0/2 - 2*0.1 - 0.5 = 1.3
    # token 3 (once, negative): -2*2 - 0.1 - 0.5 = -4.6
    # untouched: 0, 2
    np.testing.assert_allclose(out[0], [1.0, 1.3, 2.0, -4.6], rtol=1e-6)


def test_penalty_ring_wraps():
    state = PenaltyState.create(1, 4)
    for t in range(6):
        state = state.push(jnp.asarray([t]))
    r = np.asarray(state.recent[0])
    assert set(r.tolist()) == {2, 3, 4, 5}


def test_greedy_and_temperature_zero():
    logits = jnp.asarray([[0.1, 0.9, 0.3], [2.0, 1.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(greedy_sample(logits)), [1, 0])
    cfg = SamplerConfig(temperature=0.0)
    toks = sample_logits(jax.random.PRNGKey(0), logits, cfg)
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])


def test_stochastic_sampling_distribution():
    cfg = SamplerConfig(temperature=1.0, top_k=0, top_p=1.0)
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]]))
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    toks = jax.vmap(lambda k: sample_logits(k, logits, cfg)[0])(keys)
    freq = np.bincount(np.asarray(toks), minlength=3) / 512
    assert abs(freq[0] - 0.7) < 0.08
    assert abs(freq[1] - 0.2) < 0.07


def test_vocab_padding_masked():
    cfg = SamplerConfig(temperature=0.0)
    logits = jnp.asarray([[0.0, 1.0, 99.0, 98.0]])  # last 2 are padding
    toks = sample_logits(jax.random.PRNGKey(0), logits, cfg, vocab_size=2)
    assert int(toks[0]) == 1


def test_draft_probs_topk_softmax():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.0]])
    probs, ids = draft_probs(logits, top_k=2, temperature=1.5)
    probs, ids = np.asarray(probs), np.asarray(ids)
    assert ids[0].tolist() == [1, 2]
    ref = np.exp(np.array([3.0, 2.0]) / 1.5)
    ref /= ref.sum()
    np.testing.assert_allclose(probs[0], ref, rtol=1e-5)


def test_seed_slot_bulk():
    state = PenaltyState.create(2, 4)
    state = state.seed_slot(0, [10, 11, 12, 13, 14, 15])  # 6 > window 4
    r = np.asarray(state.recent)
    assert set(r[0].tolist()) == {12, 13, 14, 15}
    assert r[1].tolist() == [-1] * 4
    assert np.asarray(state.count).tolist() == [4, 0]


def test_penalty_window_narrower_than_ring():
    """penalty_last_n smaller than the ring capacity must only count the
    most recent `window` pushes (ADVICE r1: window was computed but
    unused)."""
    cfg = SamplerConfig(penalty_repeat=2.0, penalty_last_n=2)
    state = PenaltyState.create(1, 4)  # ring holds 4, window is 2
    for t in [0, 1, 2, 3]:
        state = state.push(jnp.asarray([t]))
    logits = jnp.asarray([[4.0, 4.0, 4.0, 4.0, 4.0]])
    out = np.asarray(apply_repeat_penalty(logits, state, cfg))
    # only tokens 2 and 3 are inside the last-2 window
    np.testing.assert_allclose(out[0], [4.0, 4.0, 2.0, 2.0, 4.0], rtol=1e-6)


def test_penalty_window_after_wrap():
    cfg = SamplerConfig(penalty_repeat=2.0, penalty_last_n=2)
    state = PenaltyState.create(1, 3)
    for t in [0, 1, 2, 3, 4]:  # ring now holds {2,3,4}; window = {3,4}
        state = state.push(jnp.asarray([t]))
    logits = jnp.asarray([[4.0, 4.0, 4.0, 4.0, 4.0]])
    out = np.asarray(apply_repeat_penalty(logits, state, cfg))
    np.testing.assert_allclose(out[0], [4.0, 4.0, 4.0, 2.0, 2.0], rtol=1e-6)


def test_ignore_eos_masks_eos():
    """Reference RepeatPenaltySampler ignore_eos (sampler.cpp:88-101)."""
    cfg = SamplerConfig(penalty_repeat=2.0, penalty_last_n=4, ignore_eos=True)
    state = PenaltyState.create(1, 4)
    logits = jnp.asarray([[1.0, 5.0, 2.0]])
    out = np.asarray(apply_repeat_penalty(logits, state, cfg, eos_id=1))
    assert out[0, 1] < -1e20
    # and greedy sampling can never pick EOS
    toks = sample_logits(jax.random.PRNGKey(0), logits,
                         SamplerConfig(temperature=0.0, ignore_eos=True,
                                       penalty_repeat=2.0),
                         state, eos_id=1)
    assert int(toks[0]) == 2


def test_penalize_nl_false_restores_newline():
    """Reference saves the newline logit before penalties and restores it
    when penalize_nl=false (sampler.cpp:110-168)."""
    cfg = SamplerConfig(penalty_repeat=2.0, penalty_last_n=4,
                        penalize_nl=False)
    state = PenaltyState.create(1, 4)
    for t in [1, 2]:  # both in window; token 1 is "newline"
        state = state.push(jnp.asarray([t]))
    logits = jnp.asarray([[3.0, 6.0, 4.0]])
    out = np.asarray(apply_repeat_penalty(logits, state, cfg, nl_id=1))
    np.testing.assert_allclose(out[0], [3.0, 6.0, 2.0], rtol=1e-6)
    # penalize_nl=True penalizes it like any other token
    cfg2 = SamplerConfig(penalty_repeat=2.0, penalty_last_n=4,
                         penalize_nl=True)
    out2 = np.asarray(apply_repeat_penalty(logits, state, cfg2, nl_id=1))
    np.testing.assert_allclose(out2[0], [3.0, 3.0, 2.0], rtol=1e-6)


def test_batched_freq_present_penalties_subtractive():
    """sample_dist_batched per-slot frequency/presence penalties match
    the reference's SUBTRACTIVE semantics (sampler.cpp:76-150):
    lf -= count * freq + present * presence, applied per slot."""
    from powerserve_tpu.sampling.sampler import sample_dist_batched

    state = PenaltyState.create(2, 4)
    # slot 0 window: [1, 1, 2]; slot 1: empty
    state = state.push(jnp.asarray([1, -1]),
                       active=jnp.asarray([True, False]))
    state = state.push(jnp.asarray([1, -1]),
                       active=jnp.asarray([True, False]))
    state = state.push(jnp.asarray([2, -1]),
                       active=jnp.asarray([True, False]))
    logits = jnp.asarray([[5.0, 5.0, 5.0, 5.0],
                          [5.0, 5.0, 5.0, 5.0]])
    probs = np.asarray(sample_dist_batched(
        logits, jnp.asarray([1.0, 1.0]), jnp.asarray([0, 0]),
        jnp.asarray([1.0, 1.0]),
        state=state,
        penalty_freq=jnp.asarray([0.5, 0.5]),
        penalty_present=jnp.asarray([0.25, 0.25]), max_top_k=4))
    # slot 0: token1 -> 5 - 2*0.5 - 0.25 = 3.75; token2 -> 5 - 0.75 = 4.25
    expect = np.exp(np.asarray([5.0, 3.75, 4.25, 5.0]))
    expect /= expect.sum()
    np.testing.assert_allclose(probs[0], expect, rtol=1e-5)
    # slot 1 untouched (its own window is empty): uniform
    np.testing.assert_allclose(probs[1], 0.25, rtol=1e-5)


def test_batched_repeat_and_freq_compose():
    """repeat (multiplicative) and freq/present (subtractive) stack in
    the reference's order: divide-by-repeat first, subtract after."""
    from powerserve_tpu.sampling.sampler import sample_dist_batched

    state = PenaltyState.create(1, 4)
    state = state.push(jnp.asarray([0]))
    logits = jnp.asarray([[4.0, 4.0]])
    probs = np.asarray(sample_dist_batched(
        logits, jnp.asarray([1.0]), jnp.asarray([0]), jnp.asarray([1.0]),
        state=state, penalty_repeat=jnp.asarray([2.0]),
        penalty_freq=jnp.asarray([1.0]),
        penalty_present=jnp.asarray([1.0]), max_top_k=2))
    # token0: 4/2 - 1 - 1 = 0; token1: 4
    expect = np.exp(np.asarray([0.0, 4.0]))
    expect /= expect.sum()
    np.testing.assert_allclose(probs[0], expect, rtol=1e-5)
