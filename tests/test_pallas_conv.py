"""Fused Pallas sparse-conv kernel vs the XLA rulebook engine.

Runs the kernel in interpreter mode (CPU) on small synthetic voxel sets
and checks exact agreement with the reference engine at bf16-matched
precision, plus the window-coverage diagnostic and custom-vjp gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.ops import pallas_conv as P
from btcdet_tpu.ops import sparse as S


def make_st(seed=0, n=3000, shape=(11, 100, 88), batch=2, C=16, cap=None):
    rng = np.random.RandomState(seed)
    nz, ny, nx = shape
    b = rng.randint(0, batch, n)
    z = rng.randint(0, nz, n)
    y = rng.randint(0, ny, n)
    x = rng.randint(0, nx, n)
    coords = np.unique(np.stack([b, z, y, x], 1), axis=0).astype(np.int32)
    n = len(coords)
    cap = cap or ((n + 255) // 256) * 256
    pad = cap - n
    coords = np.concatenate([coords, np.full((pad, 4), -1, np.int32)])
    feats = rng.randn(cap, C).astype(np.float32)
    feats[n:] = 0
    st = S.from_coords(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
    return st


def bf16(x):
    return np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))


def test_fused_subm_conv_matches_engine():
    st = make_st()
    C, CO, K = 16, 24, 27
    rng = np.random.RandomState(1)
    w = jnp.asarray((rng.randn(K, C, CO) * 0.1).astype(np.float32))

    in_idx, found = S.subm_rulebook(st, 3)
    ref = S.apply_rulebook_matmul(
        jnp.asarray(bf16(st.features)), in_idx, found, jnp.asarray(bf16(w)))

    out = P.fused_subm_conv(
        st.features, st.coords, st.keys, st.valid, st.spatial_shape,
        st.batch_size, w, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_fused_strided_conv_matches_engine():
    st = make_st(seed=2)
    C, CO = 16, 32
    rng = np.random.RandomState(3)
    w = jnp.asarray((rng.randn(27, C, CO) * 0.1).astype(np.float32))
    keys, coords, nnz, out_shape = S.conv_output_sites(st, 3, 2, 1, st.capacity)
    in_idx, found = S.conv_rulebook(st, coords, keys != S.INT32_MAX, 3, 2, 1)
    ref = S.apply_rulebook_matmul(
        jnp.asarray(bf16(st.features)), in_idx, found, jnp.asarray(bf16(w)))

    out = P.fused_conv(
        st.features, st.keys, coords, keys != S.INT32_MAX, st.spatial_shape,
        st.batch_size, w, 3, 2, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_fused_z_only_conv_matches_engine():
    """conv_out-style kernel (3,1,1) stride (2,1,1)."""
    st = make_st(seed=4, shape=(5, 100, 88))
    C, CO = 16, 20
    rng = np.random.RandomState(5)
    w = jnp.asarray((rng.randn(3, C, CO) * 0.1).astype(np.float32))
    keys, coords, nnz, out_shape = S.conv_output_sites(
        st, (3, 1, 1), (2, 1, 1), 0, st.capacity)
    in_idx, found = S.conv_rulebook(
        st, coords, keys != S.INT32_MAX, (3, 1, 1), (2, 1, 1), 0)
    ref = S.apply_rulebook_matmul(
        jnp.asarray(bf16(st.features)), in_idx, found, jnp.asarray(bf16(w)))

    out = P.fused_conv(
        st.features, st.keys, coords, keys != S.INT32_MAX, st.spatial_shape,
        st.batch_size, w, (3, 1, 1), (2, 1, 1), 0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_fused_pool_max_and_sum():
    st = make_st(seed=6)
    keys, coords, nnz, out_shape = S.conv_output_sites(st, 3, 2, 1, st.capacity)
    in_idx, found = S.conv_rulebook(st, coords, keys != S.INT32_MAX, 3, 2, 1)

    qk, G, TPG = P.qkeys_conv(
        coords, keys != S.INT32_MAX, st.spatial_shape, st.batch_size, 3, 2, 1, 128)

    fb = jnp.asarray(bf16(st.features))
    ref_max = S.apply_rulebook_max(fb, in_idx, found)
    out_max = P.fused_pool(st.features, st.keys, qk, G, TPG, mode="max",
                           M=keys.shape[0], interpret=True)
    np.testing.assert_allclose(np.asarray(out_max), np.asarray(ref_max),
                               atol=2e-2, rtol=2e-2)

    ref_sum = jnp.where(found[..., None], fb[in_idx], 0.0).sum(axis=0)
    out_sum = P.fused_pool(st.features, st.keys, qk, G, TPG, mode="sum",
                           M=keys.shape[0], interpret=True)
    np.testing.assert_allclose(np.asarray(out_sum), np.asarray(ref_sum),
                               atol=5e-2, rtol=2e-2)


def test_window_coverage_diagnostic():
    st = make_st(seed=7, n=6000)
    T, WIN, NB = 256, 128, 6
    nba, nbb = NB // 2, NB - NB // 2
    qk, G, TPG = P.qkeys_subm(
        st.coords, st.valid, st.spatial_shape, st.batch_size, 3, T)
    _, _, kp, NP = P.prep_table(st.features, st.keys, WIN, NB)
    starts = P.window_starts(kp, qk, WIN, T, nba, nbb)
    assert int(P.span_overflow(kp, qk, starts, WIN, nba, nbb, T)) == 0


def test_pallas_subm_full_backward_matches_engine():
    """The rulebook-free subm backward (df via tap-reversed conv, dW via
    the dw kernel) vs gradients of the bf16-matched XLA expression."""
    st = make_st(seed=12, n=1500)
    C, CO = 16, 16
    rng = np.random.RandomState(13)
    w = jnp.asarray((rng.randn(27, C, CO) * 0.1).astype(np.float32))
    in_idx, found = S.subm_rulebook(st, 3)
    qk, G, TPG = P.qkeys_subm(
        st.coords, st.valid, st.spatial_shape, st.batch_size, 3, 256)

    def pal_loss(f, ww):
        out = S._pallas_subm_ad((G, TPG, 256, 128, 6, st.capacity, P.tap_perm(3)),
                                f, ww, qk, st.keys)
        return (out ** 2).sum()

    def ref_loss(f, ww):
        out = S.apply_rulebook_matmul(
            f.astype(jnp.bfloat16).astype(jnp.float32), in_idx, found,
            ww.astype(jnp.bfloat16).astype(jnp.float32))
        return (out ** 2).sum()

    orig = P._fused_call
    orig_dw = P._fused_call_dw
    try:
        P._fused_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        P._fused_call_dw = lambda *a, **k: orig_dw(*a, **{**k, "interpret": True})
        gf, gw = jax.grad(pal_loss, argnums=(0, 1))(st.features, w)
    finally:
        P._fused_call = orig
        P._fused_call_dw = orig_dw
    gf_r, gw_r = jax.grad(ref_loss, argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r), atol=0.3, rtol=0.1)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=0.5, rtol=0.1)


def test_pallas_strided_full_backward_matches_engine():
    """Rulebook-free strided backward (transpose-query df + dw kernel)
    vs gradients of the bf16-matched XLA expression."""
    st = make_st(seed=14, n=2000)
    C, CO = 16, 24
    rng = np.random.RandomState(15)
    w = jnp.asarray((rng.randn(27, C, CO) * 0.1).astype(np.float32))
    keys, coords, nnz, out_shape = S.conv_output_sites(st, 3, 2, 1, st.capacity)
    in_idx, found = S.conv_rulebook(st, coords, keys != S.INT32_MAX, 3, 2, 1)
    T = 128
    qk, G, TPG = P.qkeys_conv(
        coords, keys != S.INT32_MAX, st.spatial_shape, st.batch_size, 3, 2, 1, T)
    cfg = (G, TPG, T, 128, 6, keys.shape[0],
           tuple(int(x) for x in out_shape), st.batch_size,
           (3, 3, 3), (2, 2, 2), (1, 1, 1), P.tap_perm(3))

    def pal_loss(f, ww):
        out = S._pallas_strided_ad(cfg, f, ww, qk, st.keys, keys, st.coords)
        return (out ** 2).sum()

    def ref_loss(f, ww):
        out = S.apply_rulebook_matmul(
            f.astype(jnp.bfloat16).astype(jnp.float32), in_idx, found,
            ww.astype(jnp.bfloat16).astype(jnp.float32))
        return (out ** 2).sum()

    orig = P._fused_call
    orig_dw = P._fused_call_dw
    try:
        P._fused_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        P._fused_call_dw = lambda *a, **k: orig_dw(*a, **{**k, "interpret": True})
        gf, gw = jax.grad(pal_loss, argnums=(0, 1))(st.features, w)
    finally:
        P._fused_call = orig
        P._fused_call_dw = orig_dw
    gf_r, gw_r = jax.grad(ref_loss, argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r), atol=0.3, rtol=0.1)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=0.5, rtol=0.1)


def test_pallas_conv_ad_gradients_match_engine():
    st = make_st(seed=8, n=1500)
    C, CO = 16, 16
    rng = np.random.RandomState(9)
    w = jnp.asarray((rng.randn(27, C, CO) * 0.1).astype(np.float32))
    in_idx, found = S.subm_rulebook(st, 3)

    def ref_loss(f, ww):
        return (S.apply_rulebook_matmul(f, in_idx, found, ww) ** 2).sum()

    gf_ref, gw_ref = jax.grad(ref_loss, argnums=(0, 1))(st.features, w)

    qk, G, TPG = P.qkeys_subm(
        st.coords, st.valid, st.spatial_shape, st.batch_size, 3, 256)

    def pal_loss(f, ww):
        out = S._pallas_conv_ad(
            (G, TPG, 256, 128, 6, st.capacity, P.tap_perm(3)),
            f, ww, qk, st.keys, in_idx, found)
        return (out ** 2).sum()

    # the custom-vjp backward differentiates the XLA expression with the
    # pallas (bf16) primal output in the cotangent chain; compare against
    # the engine's grads with matching bf16 forward
    def ref_loss_bf(f, ww):
        out = S.apply_rulebook_matmul(
            f.astype(jnp.bfloat16).astype(jnp.float32), in_idx, found,
            ww.astype(jnp.bfloat16).astype(jnp.float32))
        return (out ** 2).sum()

    import btcdet_tpu.ops.pallas_conv as PC
    orig = PC._fused_call
    # run the pallas primal in interpreter mode on CPU
    import functools as _ft
    PC_fused = _ft.partial(orig, interpret=True)
    try:
        PC._fused_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        gf, gw = jax.grad(pal_loss, argnums=(0, 1))(st.features, w)
    finally:
        PC._fused_call = orig
    gf_r, gw_r = jax.grad(ref_loss_bf, argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r), atol=0.3, rtol=0.1)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=0.5, rtol=0.1)


def test_tile_skip_large_capacity_headroom():
    """Capacity far above nnz: tiles entirely past the live rows are
    skipped via the nnz scalar (`_qk_nnz` gate) -- output must still
    match the engine exactly, with zeros in the padding rows."""
    st = make_st(seed=5, n=900, cap=2048)  # ~780 live rows, 2048 cap
    C, CO = 16, 24
    rng = np.random.RandomState(7)
    w = jnp.asarray((rng.randn(27, C, CO) * 0.1).astype(np.float32))

    in_idx, found = S.subm_rulebook(st, 3)
    ref = S.apply_rulebook_matmul(
        jnp.asarray(bf16(st.features)), in_idx, found, jnp.asarray(bf16(w)))
    out = P.fused_subm_conv(
        st.features, st.coords, st.keys, st.valid, st.spatial_shape,
        st.batch_size, w, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)
    nnz = int(np.asarray(st.nnz))
    assert (np.asarray(out)[nnz:] == 0).all()

    # strided conv with oversized out capacity
    keys, coords, nnz_s, out_shape = S.conv_output_sites(st, 3, 2, 1, 2048)
    valid = coords[:, 0] >= 0
    qk, G, TPG = P.qkeys_conv(coords, valid, st.spatial_shape, st.batch_size,
                              3, 2, 1, 128)
    out2 = P.fused_conv(
        st.features, st.keys, coords, valid, st.spatial_shape, st.batch_size,
        w, 3, 2, 1, interpret=True)
    rb_idx, rb_found = S.conv_rulebook(st, coords, valid, 3, 2, 1)
    ref2 = S.apply_rulebook_matmul(
        jnp.asarray(bf16(st.features)), rb_idx, rb_found, jnp.asarray(bf16(w)))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=2e-2, rtol=2e-2)
