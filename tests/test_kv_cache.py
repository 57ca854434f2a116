"""KVCache semantics tests: the mask/rollback/copy/truncate primitives
that token-tree speculation depends on (reference kv_cache.hpp:97-278)."""

import numpy as np
import jax.numpy as jnp

from powerserve_tpu.kv import KVCache


def _mk(slots=2, T=16, layers=2, heads=2, dim=4, dtype="bf16"):
    return KVCache.create(layers, slots, T, heads, dim, dtype=dtype)


def test_append_advance_rollback():
    kv = _mk()
    S, Tn = 2, 3
    k = jnp.ones((S, Tn, 2, 4))
    pos = jnp.broadcast_to(jnp.arange(Tn)[None, :], (S, Tn))
    for layer in range(2):
        kv = kv.append(layer, k, k * 2, pos)
    kv = kv.advance(pos)
    assert np.asarray(kv.pos).tolist() == [3, 3]
    assert np.asarray(kv.mask)[:, :4].tolist() == [[True] * 3 + [False]] * 2

    kv = kv.rollback(2)
    assert np.asarray(kv.pos).tolist() == [1, 1]
    assert np.asarray(kv.mask)[:, :3].tolist() == [[True, False, False]] * 2


def test_rollback_partial_active():
    kv = _mk()
    pos = jnp.broadcast_to(jnp.arange(4)[None, :], (2, 4))
    kv = kv.advance(pos)
    kv = kv.rollback(2, active=jnp.array([True, False]))
    assert np.asarray(kv.pos).tolist() == [2, 4]


def test_set_mask_tree_visibility():
    """Draft-tree switch_parent: mask/unmask specific cached tokens."""
    kv = _mk()
    pos = jnp.broadcast_to(jnp.arange(4)[None, :], (2, 4))
    kv = kv.advance(pos)
    kv = kv.set_mask(0, jnp.array([1, 2]), False)
    m = np.asarray(kv.mask)
    assert m[0, :4].tolist() == [True, False, False, True]
    assert m[1, :4].tolist() == [True] * 4
    kv = kv.set_mask(0, jnp.array([2]), True)
    assert np.asarray(kv.mask)[0, :4].tolist() == [True, False, True, True]


def test_copy_token_compaction():
    kv = _mk(dtype="int8")
    S, Tn = 2, 4
    vals = jnp.arange(S * Tn * 2 * 4, dtype=jnp.float32).reshape(S, Tn, 2, 4) + 1
    pos = jnp.broadcast_to(jnp.arange(Tn)[None, :], (S, Tn))
    for layer in range(2):
        kv = kv.append(layer, vals, vals, pos)
    kv = kv.advance(pos)
    kv = kv.copy_token(0, dst=jnp.asarray(1), src=jnp.asarray(3))
    k = np.asarray(kv.k)  # [L, S, H, T, D]
    np.testing.assert_array_equal(k[:, 0, :, 1], k[:, 0, :, 3])
    sc = np.asarray(kv.k_scale)
    np.testing.assert_array_equal(sc[:, 0, :, 1], sc[:, 0, :, 3])
    # other slot untouched
    assert not np.array_equal(k[:, 1, :, 1], k[:, 1, :, 3])


def test_gather_tokens_batched_compaction():
    """Verify's acceptance path: move accepted tree nodes to the front."""
    kv = _mk(dtype="int8")
    S, Tn = 2, 6
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((S, Tn, 2, 4)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(Tn)[None, :], (S, Tn))
    for layer in range(2):
        kv = kv.append(layer, vals, vals, pos)
    kv = kv.advance(pos)
    before = np.asarray(kv.k).copy()
    # slot 0: accepted tree nodes at cache positions [2, 4, 5] -> dst 0..2
    src = jnp.asarray([[2, 4, 5], [0, 1, 2]])
    kv2 = kv.gather_tokens(jnp.arange(2), src, jnp.zeros(2, jnp.int32))
    after = np.asarray(kv2.k)  # [L, S, H, T, D]
    np.testing.assert_array_equal(after[:, 0, :, 0], before[:, 0, :, 2])
    np.testing.assert_array_equal(after[:, 0, :, 1], before[:, 0, :, 4])
    np.testing.assert_array_equal(after[:, 0, :, 2], before[:, 0, :, 5])
    np.testing.assert_array_equal(after[:, 1, :, :3], before[:, 1, :, :3])


def test_truncate_to_system_prompt():
    """Persistent system-prompt prefix semantics (reference reset_kv_cache
    truncates to kv_size, not zero: causal_models.cpp:259-261)."""
    kv = _mk()
    pos = jnp.broadcast_to(jnp.arange(10)[None, :], (2, 10))
    kv = kv.advance(pos)
    kv = kv.truncate(4)
    assert np.asarray(kv.pos).tolist() == [4, 4]
    m = np.asarray(kv.mask)
    assert m[:, :4].all() and not m[:, 4:].any()


def test_reset_slot():
    kv = _mk()
    pos = jnp.broadcast_to(jnp.arange(5)[None, :], (2, 5))
    kv = kv.advance(pos)
    kv = kv.reset_slot(1)
    assert np.asarray(kv.pos).tolist() == [5, 0]
    assert not np.asarray(kv.mask)[1].any()
    assert np.asarray(kv.mask)[0, :5].all()


def test_advance_with_invisible_tokens():
    """Tree drafts write tokens masked-off (visible=False) so sibling
    branches stay invisible until switch_parent unmasks them."""
    kv = _mk()
    pos = jnp.asarray([[0, 1, 2], [0, 1, 2]])
    visible = jnp.asarray([[True, False, True], [True, True, True]])
    kv = kv.advance(pos, visible=visible)
    m = np.asarray(kv.mask)
    assert m[0, :3].tolist() == [True, False, True]
    assert m[1, :3].tolist() == [True, True, True]
    assert np.asarray(kv.pos).tolist() == [3, 3]


def test_append_out_of_range_dropped():
    kv = _mk(T=4)
    k = jnp.ones((2, 3, 2, 4))
    pos = jnp.asarray([[2, 3, 4], [2, 3, 4]])  # position 4 out of range
    kv0 = kv
    for layer in range(2):
        kv = kv.append(layer, k, k, pos)
    kv = kv.advance(pos)
    # pos advances only by the tokens actually stored: the out-of-range
    # position 4 was dropped, so counting it would desync pos from the
    # cache contents (same rule drops the scheduler's -1 pad lanes)
    assert np.asarray(kv.pos).tolist() == [2, 2]
    m = np.asarray(kv.mask)
    assert m[:, 2:4].all()
    # nothing visible out of bounds; position 3 value intact (not clobbered
    # by the clipped oob write)
    k3 = np.asarray(kv.k)[:, :, :, 3]
    assert np.abs(k3).max() > 0


def test_kv_prefix_save_load(tmp_path):
    """Persistent system-prompt KV (reference load_kv semantics):
    generation continuing from a loaded prefix must equal generation
    with the prompt prefilled."""
    import jax.numpy as jnp
    from powerserve_tpu.kv import load_prefix, save_prefix

    kv = _mk(slots=2, T=16, dtype="int8")
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((2, 5, 2, 4)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(5)[None, :], (2, 5))
    for layer in range(2):
        kv = kv.append(layer, vals, vals * 2, pos)
    kv = kv.advance(pos)

    path = tmp_path / "prefix.npz"
    n = save_prefix(kv, path, slot=0)
    assert n == 5

    fresh = _mk(slots=2, T=16, dtype="int8")
    fresh, m = load_prefix(fresh, path, slot=1)
    assert m == 5
    assert np.asarray(fresh.pos).tolist() == [0, 5]
    np.testing.assert_array_equal(np.asarray(fresh.k)[:, 1, :, :5],
                                  np.asarray(kv.k)[:, 0, :, :5])
    np.testing.assert_array_equal(np.asarray(fresh.k_scale)[:, 1, :, :5],
                                  np.asarray(kv.k_scale)[:, 0, :, :5])
    assert np.asarray(fresh.mask)[1, :5].all()
    assert not np.asarray(fresh.mask)[1, 5:].any()


def test_kv_prefix_shape_mismatch(tmp_path):
    from powerserve_tpu.kv import load_prefix, save_prefix

    kv = _mk(slots=1, T=8, dtype="bf16")
    kv = kv.advance(jnp.arange(3)[None, :])
    path = tmp_path / "p.npz"
    save_prefix(kv, path)
    other = KVCache.create(3, 1, 8, 2, 4, dtype="bf16")  # wrong layers
    import pytest as _pytest
    with _pytest.raises(ValueError):
        load_prefix(other, path)


def test_advance_padded_lanes_do_not_count():
    """Batched prefill pads the last chunk with -1 position lanes; pos
    must advance by the real token count only (ADVICE r1 high)."""
    kv = _mk(T=32)
    pos = jnp.asarray([[0, 1, 2, -1, -1], [0, 1, 2, 3, 4]])
    kv = kv.advance(pos)
    assert np.asarray(kv.pos).tolist() == [3, 5]
    m = np.asarray(kv.mask)
    assert m[0, :4].tolist() == [True, True, True, False]
    assert m[1, :5].all()


def test_gather_tokens_near_capacity_no_clobber():
    """Speculative commit near cache capacity: over-capacity dst and
    padded (-1) src entries are dropped, not clipped onto live entries
    (ADVICE r1 low)."""
    kv = _mk(T=8)
    k = jnp.arange(2 * 8 * 2 * 4, dtype=jnp.float32).reshape(2, 8, 2, 4)
    pos = jnp.broadcast_to(jnp.arange(8)[None, :], (2, 8))
    for layer in range(2):
        kv = kv.append(layer, k, k, pos)
    kv = kv.advance(pos[:, :6])  # 6 committed tokens
    before = np.asarray(kv.k).copy()
    # commit 4 nodes from positions 6,7 (+padding): dst 6..9 overflows at 8
    src = jnp.asarray([[6, 7, -1, -1], [6, 7, -1, -1]])
    out = kv.gather_tokens(jnp.arange(2), src, jnp.asarray([6, 6]))
    after = np.asarray(out.k)
    # in-range moves happened (src==dst here, values unchanged), and the
    # padded/-1 sources did NOT clobber any live entry
    np.testing.assert_array_equal(after, before)
