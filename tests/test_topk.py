"""Unit tests for ops/topk.py radix-select top-k.

The op is kept in the library as the documented alternative to
`lax.top_k` for the PassOccVox eval selection (see
tools/microbench_topk.py for the TPU timing comparison); these tests pin
its set-equivalence to exact top-k.
"""

import numpy as np
import jax
import jax.numpy as jnp

from btcdet_tpu.ops.topk import capped_nonzero_top_k


def _check(sel_np, k):
    vals, idx, valid = jax.device_get(
        capped_nonzero_top_k(jnp.asarray(sel_np), k)
    )
    for b in range(sel_np.shape[0]):
        nz = int((sel_np[b] > 0).sum())
        nsel = int(valid[b].sum())
        assert nsel == min(k, nz)
        # valid slots are a contiguous prefix
        assert np.all(valid[b][:nsel]) and not np.any(valid[b][nsel:])
        got = np.sort(vals[b][valid[b]])[::-1]
        want = np.sort(sel_np[b])[::-1][:nsel]
        # equal up to the 2^-17-relative tie band at the boundary
        if nsel:
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=0)
        # idx/vals agree, invalid slots zeroed
        assert np.array_equal(sel_np[b][idx[b][valid[b]]], vals[b][valid[b]])
        assert np.all(vals[b][~valid[b]] == 0)


def test_basic_selection():
    rng = np.random.RandomState(0)
    p = rng.uniform(0, 1, (2, 4096)).astype(np.float32)
    sel = np.where(p > 0.6, p, 0.0).astype(np.float32)
    _check(sel, 512)


def test_fewer_nonzero_than_k():
    rng = np.random.RandomState(1)
    p = rng.uniform(0, 1, (1, 2048)).astype(np.float32)
    sel = np.where(p > 0.99, p, 0.0).astype(np.float32)
    _check(sel, 512)


def test_all_zero_row():
    sel = np.zeros((2, 1024), np.float32)
    sel[1, 7] = 0.5
    _check(sel, 16)


def test_duplicate_values():
    sel = np.zeros((1, 1024), np.float32)
    sel[0, ::3] = 0.75  # 342 identical candidates
    _check(sel, 100)
    _check(sel, 512)


def test_k_equals_n():
    rng = np.random.RandomState(2)
    p = rng.uniform(0, 1, (1, 256)).astype(np.float32)
    _check(p, 256)


def test_top_k_set_signed_exact():
    """top_k_set must select exactly the lax.top_k SET for signed scores
    (distinct values -> unique set), including -inf invalid sentinels
    and rows with fewer valid entries than k."""
    import jax
    import jax.numpy as jnp

    from btcdet_tpu.ops import topk

    rng = np.random.RandomState(5)
    x = rng.uniform(-10, 10, (3, 4096)).astype(np.float32)
    valid = rng.rand(3, 4096) > 0.2
    k = 256
    idx, got = jax.jit(topk.top_k_set, static_argnames="k")(
        jnp.asarray(x), jnp.asarray(valid), k=k)
    idx, got = np.asarray(idx), np.asarray(got)

    xm = np.where(valid, x, -np.inf)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(xm), k)
    for b in range(3):
        assert set(idx[b][got[b]].tolist()) == set(np.asarray(ref_i[b]).tolist())

    # fewer valid than k
    valid2 = np.zeros((1, 4096), bool)
    valid2[0, 10:50] = True
    idx2, got2 = jax.jit(topk.top_k_set, static_argnames="k")(
        jnp.asarray(x[:1]), jnp.asarray(valid2), k=k)
    assert int(np.asarray(got2).sum()) == 40
    assert set(np.asarray(idx2)[0][np.asarray(got2)[0]].tolist()) == set(range(10, 50))
