"""Sparse conv engine correctness vs dense convolution on small grids
(SURVEY.md §4 implication (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.ops import sparse


def make_sparse(rng, shape=(5, 6, 7), batch=2, n_active=40, cap=64, cin=3):
    nz, ny, nx = shape
    # unique random sites
    all_sites = np.array(
        [(b, z, y, x) for b in range(batch) for z in range(nz) for y in range(ny) for x in range(nx)]
    )
    sel = rng.choice(len(all_sites), size=n_active, replace=False)
    coords = np.full((cap, 4), -1, dtype=np.int32)
    coords[:n_active] = all_sites[sel]
    feats = np.zeros((cap, cin), dtype=np.float32)
    feats[:n_active] = rng.randn(n_active, cin).astype(np.float32)
    st = sparse.from_coords(jnp.asarray(feats), jnp.asarray(coords), shape, batch)
    return st


def dense_of(st):
    return np.asarray(st.dense())  # (B, nz, ny, nx, C)


def dense_conv(x, w_knc, kernel, stride, padding):
    """x: (B, nz, ny, nx, Cin); w: (K, Cin, Cout) row-major (dz, dy, dx)."""
    kz, ky, kx = kernel
    w = np.asarray(w_knc).reshape(kz, ky, kx, w_knc.shape[1], w_knc.shape[2])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(w),
        window_strides=stride,
        padding=[(padding[i], padding[i]) for i in range(3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return np.asarray(out)


def test_dense_roundtrip():
    rng = np.random.RandomState(0)
    st = make_sparse(rng)
    d = dense_of(st)
    assert d.shape == (2, 5, 6, 7, 3)
    n_nonzero = (np.abs(d).sum(-1) > 0).sum()
    assert n_nonzero <= 40


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(1)
    st = make_sparse(rng)
    mod = sparse.SubMConv3d(out_channels=5, kernel_size=3)
    params = mod.init(jax.random.PRNGKey(0), st, {})
    out = mod.apply(params, st, {})
    w = params["params"]["kernel"]

    ref = dense_conv(dense_of(st), np.asarray(w), (3, 3, 3), (1, 1, 1), (1, 1, 1))
    got = dense_of(out)
    active = np.abs(dense_of(st)).sum(-1) > 0
    np.testing.assert_allclose(got[active], ref[active], rtol=1e-4, atol=1e-5)
    # submanifold: inactive sites stay empty
    assert np.abs(got[~active]).max() == 0.0


@pytest.mark.parametrize("stride,padding,kernel", [
    ((2, 2, 2), (1, 1, 1), (3, 3, 3)),
    ((1, 2, 2), (0, 1, 1), (1, 3, 3)),
    ((2, 1, 1), (0, 0, 0), (3, 1, 1)),
])
def test_strided_conv_matches_dense(stride, padding, kernel):
    rng = np.random.RandomState(2)
    st = make_sparse(rng, shape=(6, 8, 8), n_active=60, cap=128)
    mod = sparse.SparseConv3d(
        out_channels=4, kernel_size=kernel, stride=stride, padding=padding,
        out_capacity=512,
    )
    params = mod.init(jax.random.PRNGKey(0), st, {})
    out = mod.apply(params, st, {})
    w = params["params"]["kernel"]

    ref = dense_conv(dense_of(st), np.asarray(w), kernel, stride, padding)
    got = dense_of(out)
    assert got.shape == ref.shape
    # sparse output sites must carry the dense value
    coords = np.asarray(out.coords)
    for i in range(out.capacity):
        b, z, y, x = coords[i]
        if b < 0:
            continue
        np.testing.assert_allclose(got[b, z, y, x], ref[b, z, y, x], rtol=1e-4, atol=1e-5)
    # all non-trivial dense outputs must be covered by sparse sites
    site_mask = np.zeros(ref.shape[:4], dtype=bool)
    for i in range(out.capacity):
        b, z, y, x = coords[i]
        if b >= 0:
            site_mask[b, z, y, x] = True
    np.testing.assert_allclose(ref[~site_mask], 0.0, atol=1e-5)


def test_transpose_conv_matches_manual():
    rng = np.random.RandomState(3)
    st = make_sparse(rng, shape=(3, 4, 4), n_active=20, cap=32, cin=2)
    mod = sparse.SparseConvTranspose3d(
        out_channels=3, kernel_size=(2, 2, 2), stride=(2, 2, 2), padding=0,
        out_capacity=256,
    )
    params = mod.init(jax.random.PRNGKey(0), st, {})
    out = mod.apply(params, st, {})
    w = np.asarray(params["params"]["kernel"]).reshape(2, 2, 2, 2, 3)

    # manual scatter: out[i*s + off] += in[i] @ W[off]
    x = dense_of(st)
    ref = np.zeros((2, 6, 8, 8, 3), dtype=np.float32)
    for b in range(2):
        for z in range(3):
            for y in range(4):
                for xx in range(4):
                    v = x[b, z, y, xx]
                    if np.abs(v).sum() == 0:
                        continue
                    for dz in range(2):
                        for dy in range(2):
                            for dx in range(2):
                                ref[b, 2 * z + dz, 2 * y + dy, 2 * xx + dx] += v @ w[dz, dy, dx]
    got = dense_of(out)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_inverse_conv_restores_coords():
    rng = np.random.RandomState(4)
    st = make_sparse(rng, shape=(6, 8, 8), n_active=50, cap=128, cin=3)
    cache = {}
    down = sparse.SparseConv3d(
        out_channels=4, kernel_size=3, stride=2, padding=1, indice_key="s2",
        out_capacity=128,
    )
    p1 = down.init(jax.random.PRNGKey(0), st, cache)
    cache = {}
    mid = down.apply(p1, st, cache)
    inv = sparse.SparseInverseConv3d(
        out_channels=2, kernel_size=3, indice_key="s2", stride=2, padding=1,
    )
    p2 = inv.init(jax.random.PRNGKey(1), mid, cache)
    out = inv.apply(p2, mid, cache)
    np.testing.assert_array_equal(np.asarray(out.coords), np.asarray(st.coords))
    assert out.spatial_shape == st.spatial_shape

    # value check vs manual: fine f gets sum over coarse c, off with f = c*2-1+off
    w = np.asarray(p2["params"]["kernel"]).reshape(3, 3, 3, 4, 2)
    xc = dense_of(mid)
    ref = np.zeros((2, 6, 8, 8, 2), dtype=np.float32)
    for b in range(2):
        for z in range(xc.shape[1]):
            for y in range(xc.shape[2]):
                for xx in range(xc.shape[3]):
                    v = xc[b, z, y, xx]
                    if np.abs(v).sum() == 0:
                        continue
                    for dz in range(3):
                        for dy in range(3):
                            for dx in range(3):
                                fz, fy, fx = 2 * z - 1 + dz, 2 * y - 1 + dy, 2 * xx - 1 + dx
                                if 0 <= fz < 6 and 0 <= fy < 8 and 0 <= fx < 8:
                                    ref[b, fz, fy, fx] += v @ w[dz, dy, dx]
    got = dense_of(out)
    # only at restored (original) sites
    active = np.abs(dense_of(st)).sum(-1) > 0
    np.testing.assert_allclose(got[active], ref[active], rtol=1e-4, atol=1e-5)
    assert np.abs(got[~active]).max() == 0.0


def test_maxpool_matches_dense():
    rng = np.random.RandomState(5)
    st = make_sparse(rng, shape=(4, 6, 6), n_active=40, cap=64, cin=2)
    mod = sparse.SparseMaxPool3d(kernel_size=2, stride=2, padding=0, out_capacity=64)
    out = mod.apply({}, st, {})
    x = dense_of(st)
    got = dense_of(out)
    occ = np.abs(x).sum(-1) > 0
    for b in range(2):
        for z in range(2):
            for y in range(3):
                for xx in range(3):
                    block = x[b, 2*z:2*z+2, 2*y:2*y+2, 2*xx:2*xx+2].reshape(-1, 2)
                    bocc = occ[b, 2*z:2*z+2, 2*y:2*y+2, 2*xx:2*xx+2].reshape(-1)
                    if bocc.any():
                        ref = block[bocc].max(axis=0)
                        np.testing.assert_allclose(got[b, z, y, xx], ref, rtol=1e-5)
                    else:
                        np.testing.assert_allclose(got[b, z, y, xx], 0.0)


def test_masked_batchnorm():
    rng = np.random.RandomState(6)
    x = rng.randn(32, 4).astype(np.float32)
    mask = np.zeros(32, bool)
    mask[:20] = True
    bn = sparse.MaskedBatchNorm(momentum=0.1)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), use_running_average=False)
    y, mutated = bn.apply(
        variables, jnp.asarray(x), jnp.asarray(mask),
        use_running_average=False, mutable=["batch_stats"],
    )
    y = np.asarray(y)
    # normalized over the masked rows
    np.testing.assert_allclose(y[:20].mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(y[:20].std(0), 1.0, atol=2e-2)
    assert np.abs(y[20:]).max() == 0.0
    # running stats moved toward batch stats
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        0.1 * x[:20].mean(0), rtol=1e-4, atol=1e-5,
    )


class TestGroupedRulebooks:
    """Grouped (x-consecutive slice) rulebooks must reproduce the
    original per-offset rulebooks exactly."""

    def _rand_st(self, seed, shape=(7, 11, 13), B=2, cap=96, nnz=70):
        rng = np.random.RandomState(seed)
        nz, ny, nx = shape
        coords = np.stack([
            rng.randint(0, B, nnz), rng.randint(0, nz, nnz),
            rng.randint(0, ny, nnz), rng.randint(0, nx, nnz),
        ], axis=1).astype(np.int32)
        coords = np.unique(coords, axis=0)
        pad = np.full((cap - len(coords), 4), -1, np.int32)
        coords = np.concatenate([coords, pad])
        feats = rng.randn(cap, 8).astype(np.float32)
        feats[coords[:, 0] < 0] = 0
        return sparse.from_coords(jnp.asarray(feats), jnp.asarray(coords), shape, B)

    def test_subm_grouped_matches(self):
        for seed in range(3):
            st = self._rand_st(seed)
            w = jnp.asarray(np.random.RandomState(99).randn(27, 8, 6).astype(np.float32))
            in_idx, found = sparse.subm_rulebook(st, 3)
            ref = sparse.apply_rulebook_matmul(st.features, in_idx, found, w)
            starts, pos, found_g = sparse.subm_rulebook_grouped(st, 3)
            out = sparse.apply_rulebook_matmul_grouped(st.features, starts, pos, found_g, w)
            assert np.asarray(found_g).sum() == np.asarray(found).sum()
            np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)

    def test_conv_grouped_matches(self):
        for seed in range(3):
            st = self._rand_st(seed + 10)
            keys, coords, nnz, out_shape = sparse.conv_output_sites(st, 3, 2, 1, st.capacity)
            valid = keys != sparse.INT32_MAX
            w = jnp.asarray(np.random.RandomState(7).randn(27, 8, 5).astype(np.float32))
            in_idx, found = sparse.conv_rulebook(st, coords, valid, 3, 2, 1)
            ref = sparse.apply_rulebook_matmul(st.features, in_idx, found, w)
            starts, pos, found_g = sparse.conv_rulebook_grouped(st, coords, valid, 3, 2, 1)
            out = sparse.apply_rulebook_matmul_grouped(st.features, starts, pos, found_g, w)
            assert np.asarray(found_g).sum() == np.asarray(found).sum()
            np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)

    def test_grouped_max_and_sum_match(self):
        st = self._rand_st(42)
        keys, coords, nnz, out_shape = sparse.conv_output_sites(st, 3, 2, 1, st.capacity)
        valid = keys != sparse.INT32_MAX
        in_idx, found = sparse.conv_rulebook(st, coords, valid, 3, 2, 1)
        starts, pos, found_g = sparse.conv_rulebook_grouped(st, coords, valid, 3, 2, 1)
        ref_max = sparse.apply_rulebook_max(st.features, in_idx, found)
        out_max = sparse.apply_rulebook_max_grouped(st.features, starts, pos, found_g)
        np.testing.assert_allclose(np.asarray(ref_max), np.asarray(out_max), rtol=1e-5, atol=1e-5)
        gathered = st.features[in_idx]
        gathered = jnp.where(found[..., None], gathered, 0.0)
        ref_sum = gathered.sum(axis=0)
        out_sum = sparse.apply_rulebook_sum_grouped(st.features, starts, pos, found_g)
        np.testing.assert_allclose(np.asarray(ref_sum), np.asarray(out_sum), rtol=1e-4, atol=1e-5)

    def test_grouped_sorted_path_matches_dense(self, monkeypatch):
        """Force the sorted-search branch and compare to the dense-table
        branch."""
        st = self._rand_st(5)
        w = jnp.asarray(np.random.RandomState(3).randn(27, 8, 4).astype(np.float32))
        starts_d, pos_d, found_d = sparse.subm_rulebook_grouped(st, 3)
        out_d = sparse.apply_rulebook_matmul_grouped(st.features, starts_d, pos_d, found_d, w)
        monkeypatch.setattr(sparse, "DENSE_LOOKUP_MAX_CELLS", 0)
        starts_s, pos_s, found_s = sparse.subm_rulebook_grouped(st, 3)
        out_s = sparse.apply_rulebook_matmul_grouped(st.features, starts_s, pos_s, found_s, w)
        assert np.asarray(found_s).sum() == np.asarray(found_d).sum()
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), rtol=1e-5, atol=1e-5)


def test_lookup_cache_not_shared_across_different_coord_sets():
    """Two same-shape tensors with DIFFERENT active sites sharing one
    rulebook cache must each resolve against their own table (the dense
    lookup table is keyed by coordinate-set identity, not just shape)."""
    import jax.numpy as jnp
    from btcdet_tpu.ops import sparse

    shape = (4, 8, 8)
    ca = np.array([[0, 1, 2, 3], [0, 2, 4, 5], [-1, -1, -1, -1]], np.int32)
    cb = np.array([[0, 3, 6, 7], [0, 1, 1, 1], [-1, -1, -1, -1]], np.int32)
    fa = np.arange(3, dtype=np.float32)[:, None]
    sta = sparse.from_coords(jnp.asarray(fa), jnp.asarray(ca), shape, 1)
    stb = sparse.from_coords(jnp.asarray(fa), jnp.asarray(cb), shape, 1)

    cache = {}
    qa = sparse.linear_key(jnp.asarray(ca), shape, 1)
    qb = sparse.linear_key(jnp.asarray(cb), shape, 1)
    idx_a, found_a = sparse.lookup_in(sta, qa, cache)
    idx_b, found_b = sparse.lookup_in(stb, qb, cache)  # same cache dict
    # every valid query of each tensor must be found in ITS OWN table
    assert np.asarray(found_a)[:2].all() and not np.asarray(found_a)[2]
    assert np.asarray(found_b)[:2].all() and not np.asarray(found_b)[2]
    # and b's sites must NOT be found via a's table: query b's keys in a
    idx_ba, found_ba = sparse.lookup_in(sta, qb, cache)
    assert not np.asarray(found_ba)[:2].any()


def test_dense_yzx_layout_matches_default():
    """dense(layout='yzx') is the scatter-native (B, ny, nz, nx, C) view
    of the default (B, nz, ny, nx, C) tensor (HeightCompression consumes
    the native layout to skip a transpose)."""
    rng = np.random.RandomState(11)
    st = make_sparse(rng)
    d_zyx = np.asarray(st.dense())
    d_yzx = np.asarray(st.dense(layout="yzx"))
    np.testing.assert_array_equal(d_yzx.transpose(0, 2, 1, 3, 4), d_zyx)


def test_keys_are_y_major():
    """The table sort key is (b, y, z, x): y outranks z (the Pallas
    window-coverage contract, see ops/pallas_conv.py docstring)."""
    shape = (4, 8, 8)
    c = jnp.asarray(np.array([[0, 3, 1, 0], [0, 0, 2, 0]], np.int32))
    k = np.asarray(sparse.linear_key(c, shape, 1))
    # (z=3, y=1) must sort BEFORE (z=0, y=2)
    assert k[0] < k[1]
    back = np.asarray(sparse.key_to_coords(jnp.asarray(k), shape))
    np.testing.assert_array_equal(back, np.asarray(c))


def test_output_site_capacity_is_per_frame():
    """Regression: strided-conv output-site capacity must be allocated per
    frame. Keys are batch-major, so a GLOBAL cap lets an overfull frame 0
    consume frame 1's budget (observed at B=2 on real frames: x_conv3
    split 21461/10539 against a 2x16000 cap, zeroing slot 1's
    detections)."""
    nz, ny, nx = 4, 16, 16
    # frame 0: dense wall of actives (overflows its half of the cap after
    # stride-2 conv); frame 1: a handful of isolated sites
    f0 = [(0, z, y, x) for z in range(nz) for y in range(ny) for x in range(nx)]
    f1 = [(1, 1, 2, 3), (1, 3, 9, 12), (1, 0, 14, 1), (1, 2, 5, 7)]
    sites = np.array(f0 + f1, np.int32)
    cap = len(sites)
    coords = np.full((cap, 4), -1, np.int32)
    coords[: len(sites)] = sites
    feats = np.ones((cap, 2), np.float32)
    st = sparse.from_coords(
        jnp.asarray(feats), jnp.asarray(coords), (nz, ny, nx), 2
    )
    # per-frame budget 32: frame 0 needs 2*8*8=128 sites -> overflows;
    # frame 1 needs <= 4*8 and must keep ALL of its sites
    keys, out_coords, nnz, out_shape = sparse.conv_output_sites(
        st, 3, 2, 1, out_capacity=64
    )
    ob = np.asarray(out_coords[:, 0])
    ok = np.asarray(keys) != sparse.INT32_MAX
    n0, n1 = (ob[ok] == 0).sum(), (ob[ok] == 1).sum()
    assert n0 == 32, n0  # frame 0 truncated to ITS half only
    # every frame-1 output site present (compare vs uncapped run)
    st1 = sparse.from_coords(
        jnp.asarray(feats[-10:]),
        jnp.asarray(
            np.concatenate(
                [np.array([[0, z, y, x] for (_, z, y, x) in f1], np.int32),
                 np.full((6, 4), -1, np.int32)]
            )
        ),
        (nz, ny, nx), 1,
    )
    _, _, nnz1, _ = sparse.conv_output_sites(st1, 3, 2, 1, out_capacity=64)
    assert n1 == int(nnz1), (n1, int(nnz1))
    # keys stay sorted ascending with INT32_MAX padding
    k = np.asarray(keys)
    assert np.all(np.diff(k[ok]) > 0) and np.all(k[~ok] == sparse.INT32_MAX)


def test_from_coords_aux_rides_the_sort():
    """The det backbone zips occ-code channels onto the sorted tensor
    row-wise (`st.replace(features=occ_code)`), so the side table MUST
    be permuted by the same argsort. The merged det+occ table's
    per-frame layout is [det valid | det pad | extra valid | extra pad]
    — padding between valid blocks makes the sort non-identity even at
    batch 1 (r4 regression: btcnet passed occ_code unsorted, attaching
    every voxel's occ code to a different voxel)."""
    coords = np.array([
        # frame 0: det valid, det pad, extra valid, extra pad
        [0, 0, 0, 1], [0, 0, 1, 0], [-1, -1, -1, -1],
        [0, 1, 0, 0], [-1, -1, -1, -1],
        # frame 1
        [1, 0, 0, 0], [1, 0, 2, 2], [-1, -1, -1, -1],
        [1, 1, 1, 1], [-1, -1, -1, -1],
    ], np.int32)
    n = len(coords)
    feats = np.arange(n, dtype=np.float32)[:, None]
    aux = 100.0 + np.arange(n, dtype=np.float32)[:, None]
    st, aux_sorted = sparse.from_coords(
        jnp.asarray(feats), jnp.asarray(coords), (3, 3, 3), 2,
        aux=jnp.asarray(aux))
    f = np.asarray(st.features[:, 0])
    a = np.asarray(aux_sorted[:, 0])
    assert not np.array_equal(f, np.arange(n)), "sort must not be identity here"
    np.testing.assert_array_equal(a, 100.0 + f)  # row-aligned after sort
