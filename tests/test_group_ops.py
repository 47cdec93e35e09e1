import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import group_ops


def test_ball_query_first_k_in_point_order():
    # 1 batch, points on a line; query at origin
    xyz = np.zeros((1, 10, 3), np.float32)
    xyz[0, :, 0] = [5.0, 0.1, 0.2, 0.3, 9.0, 0.15, 0.25, 7.0, 0.05, 8.0]
    mask = np.ones((1, 10), bool)
    new_xyz = np.zeros((1, 1, 3), np.float32)
    new_mask = np.ones((1, 1), bool)

    gx, gf, idx, empty = group_ops.ball_query_group(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz), jnp.asarray(new_mask),
        radius=0.5, nsample=4, chunk=4,
    )
    got = np.asarray(idx[0, 0])
    # first 4 in-point-order within radius: indices 1, 2, 3, 5
    np.testing.assert_array_equal(got, [1, 2, 3, 5])
    assert not bool(empty[0, 0])


def test_ball_query_repeat_and_empty():
    xyz = np.zeros((1, 6, 3), np.float32)
    xyz[0, :, 0] = [9.0, 0.1, 9.0, 9.0, 9.0, 9.0]
    mask = np.ones((1, 6), bool)
    new_xyz = np.zeros((1, 2, 3), np.float32)
    new_xyz[0, 1, 0] = 100.0  # nothing near
    new_mask = np.ones((1, 2), bool)
    gx, gf, idx, empty = group_ops.ball_query_group(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz), jnp.asarray(new_mask),
        radius=0.5, nsample=3, chunk=2,
    )
    np.testing.assert_array_equal(np.asarray(idx[0, 0]), [1, 1, 1])  # repeat first
    assert not bool(empty[0, 0]) and bool(empty[0, 1])


def test_shell_query_annulus():
    xyz = np.zeros((1, 5, 3), np.float32)
    xyz[0, :, 0] = [0.05, 0.5, 1.0, 1.5, 3.0]
    mask = np.ones((1, 5), bool)
    new_xyz = np.zeros((1, 1, 3), np.float32)
    new_mask = np.ones((1, 1), bool)
    _, _, idx, empty = group_ops.ball_query_group(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz), jnp.asarray(new_mask),
        radius=(0.4, 2.0), nsample=4, chunk=1,
    )
    got = set(np.asarray(idx[0, 0]).tolist())
    assert got == {1, 2, 3}  # 0.05 inside inner shell, 3.0 outside outer


def test_query_and_group_rotation():
    # one neighbor at +x; rotate group frame by -90deg
    xyz = np.array([[[1.0, 0.0, 0.0]]], np.float32)
    mask = np.ones((1, 1), bool)
    new_xyz = np.zeros((1, 1, 3), np.float32)
    new_mask = np.ones((1, 1), bool)
    ang = np.pi / 2
    rot = np.array(
        [[[[np.cos(ang), np.sin(ang), 0], [-np.sin(ang), np.cos(ang), 0], [0, 0, 1]]]],
        np.float32,
    )
    out, empty = group_ops.query_and_group(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz), jnp.asarray(new_mask),
        radius=2.0, nsample=1, rotate_matrix=jnp.asarray(rot),
    )
    # p'_i = sum_j p_j R[i, j] (torch einsum "nmj,nij->nmi"): (1,0,0) -> R[:,0]
    got = np.asarray(out[0, 0, 0])
    np.testing.assert_allclose(got, [0.0, -1.0, 0.0], atol=1e-6)


def test_sa_module_shapes_and_masking():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    feats = rng.randn(2, 64, 4).astype(np.float32)
    mask = np.ones((2, 64), bool)
    mask[1, 40:] = False
    new_xyz = rng.randn(2, 8, 3).astype(np.float32)
    new_mask = np.ones((2, 8), bool)
    new_mask[1, 5:] = False

    mod = group_ops.PointSAModuleMSG(
        radii=[0.8, 1.6], nsamples=[4, 8], mlps=[[4 + 3, 8], [4 + 3, 8]],
    )
    vars_ = mod.init(
        jax.random.PRNGKey(0),
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz), jnp.asarray(new_mask),
        features=jnp.asarray(feats), train=False,
    )
    out = mod.apply(
        vars_,
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz), jnp.asarray(new_mask),
        features=jnp.asarray(feats), train=False,
    )
    assert out.shape == (2, 8, 16)
    assert np.abs(np.asarray(out[1, 5:])).max() == 0.0


def test_three_nn_interpolate():
    known = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]]], np.float32)
    kmask = np.ones((1, 4), bool)
    unknown = np.array([[[0.4, 0.1, 0.0]]], np.float32)
    umask = np.ones((1, 1), bool)
    dist, idx = group_ops.three_nn(
        jnp.asarray(unknown), jnp.asarray(umask), jnp.asarray(known), jnp.asarray(kmask)
    )
    assert set(np.asarray(idx[0, 0]).tolist()) == {0, 1, 2}
    feats = np.eye(4, dtype=np.float32)[None]  # (1, 4, 4)
    w = 1.0 / np.maximum(np.asarray(dist), 1e-8) ** 2
    w = w / w.sum(-1, keepdims=True)
    out = group_ops.three_interpolate(jnp.asarray(feats), idx, jnp.asarray(w))
    assert abs(float(out[0, 0].sum()) - 1.0) < 1e-5
    assert float(out[0, 0, 3]) == 0.0


def test_fps_spreads():
    rng = np.random.RandomState(0)
    xyz = rng.randn(1, 128, 3).astype(np.float32)
    mask = np.ones((1, 128), bool)
    idx = group_ops.furthest_point_sample(jnp.asarray(xyz), jnp.asarray(mask), 16)
    got = np.asarray(idx[0])
    assert len(set(got.tolist())) == 16  # distinct points


def test_shell_query_shared_candidates_falls_back_to_exact():
    """A shell (annulus) scale whose true neighbors sit beyond k_max
    nearer inner-ball points must still find them: shared-candidate
    selection is disabled when any scale has an inner radius."""
    import jax.numpy as jnp
    from btcdet_tpu.ops import group_ops

    rng = np.random.RandomState(0)
    B, M = 1, 4
    centers = rng.uniform(-5, 5, (B, M, 3)).astype(np.float32)
    # 64 points hugging each center (inside r=0.5) + 8 annulus points
    near = centers[:, :, None, :] + rng.uniform(
        -0.2, 0.2, (B, M, 64, 3)).astype(np.float32)
    ring_dir = rng.randn(B, M, 8, 3).astype(np.float32)
    ring_dir /= np.linalg.norm(ring_dir, axis=-1, keepdims=True)
    ring = centers[:, :, None, :] + ring_dir * 2.0   # dist 2.0: in (1, 3)
    pts = np.concatenate([near.reshape(B, -1, 3), ring.reshape(B, -1, 3)], 1)
    mask = np.ones(pts.shape[:2], bool)

    out = group_ops.multi_ball_query(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
        jnp.ones((B, M), bool), radii=[0.5, (1.0, 3.0)], nsamples=[16, 8],
        approx=False, shared_candidates=True,
    )
    idx_shell, empty_shell = out[1]
    assert not np.asarray(empty_shell).any(), (
        "annulus neighbors lost to inner-ball candidate starvation")
    d = np.linalg.norm(
        np.asarray(pts)[0][np.asarray(idx_shell)[0]] - centers[0][:, None], axis=-1)
    assert ((d > 1.0 - 1e-4) & (d < 3.0 + 1e-4)).all()


def test_gather_and_grouping_operation():
    """Dense-batch gather surface (reference pointnet2_batch
    gather_points / grouping_operation) incl. the scatter-add gradient."""
    rng = np.random.RandomState(7)
    feats = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, (2, 5)).astype(np.int32)
    out = group_ops.gather_points(jnp.asarray(feats), jnp.asarray(idx))
    assert out.shape == (2, 5, 4)
    np.testing.assert_allclose(np.asarray(out)[1, 3], feats[1, idx[1, 3]])

    gidx = rng.randint(0, 10, (2, 5, 3)).astype(np.int32)
    g = group_ops.grouping_operation(jnp.asarray(feats), jnp.asarray(gidx))
    assert g.shape == (2, 5, 3, 4)
    np.testing.assert_allclose(np.asarray(g)[0, 2, 1], feats[0, gidx[0, 2, 1]])

    # gradient scatter-adds duplicates (CUDA gather_points_grad parity)
    def loss(f):
        return group_ops.gather_points(f, jnp.asarray(idx)).sum()

    grad = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    counts = np.zeros((2, 10))
    for b in range(2):
        for i in idx[b]:
            counts[b, i] += 1
    np.testing.assert_allclose(grad[..., 0], counts)


def test_grouped_query_matches_exact_when_balls_fit():
    """multi_ball_query_grouped == exact per-scale selection whenever (a)
    the candidate set is complete (cand_k >= N) and (b) every ball holds
    <= nsample in-range points (no displacement anywhere) — the regime
    where every selection strategy must agree bitwise."""
    rng = np.random.RandomState(3)
    B, R, G, N = 2, 4, 8, 64
    # sparse cloud: ~N points over a 40m box -> balls hold few points
    xyz = rng.rand(B, N, 3).astype(np.float32) * 40 - 20
    mask = rng.rand(B, N) > 0.2
    centers = rng.rand(B, R, 3).astype(np.float32) * 30 - 15
    # grid points jittered around their roi center
    qpts = centers[:, :, None, :] + rng.randn(B, R, G, 3).astype(np.float32)
    new_xyz = qpts.reshape(B, R * G, 3)
    new_mask = rng.rand(B, R * G) > 0.1
    radii, ns = [1.5, 3.0], [8, 16]

    got = group_ops.multi_ball_query_grouped(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz),
        jnp.asarray(new_mask), radii, ns,
        jnp.asarray(centers), G, cand_k=N,
    )
    want = group_ops.multi_ball_query(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz),
        jnp.asarray(new_mask), radii, ns, approx=False,
        shared_candidates=False, chunk=8,
    )
    for (gi, ge), (wi, we) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(ge), np.asarray(we))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


def test_grouped_query_shell_scale_keeps_annulus_points():
    """With an annulus scale, stage 2 must not displace shell points by
    inner-radius ones (direct per-scale selection, no nearest-k_max)."""
    B, R, G = 1, 1, 1
    N = 40
    xyz = np.zeros((B, N, 3), np.float32)
    # 32 points inside r=0.5 (would fill a nearest-32 candidate cut),
    # 4 points in the annulus [1.0, 2.0]
    xyz[0, :32, 0] = np.linspace(0.05, 0.45, 32)
    xyz[0, 32:36, 0] = [1.2, 1.4, 1.6, 1.8]
    xyz[0, 36:, 0] = 9.0
    mask = np.ones((B, N), bool)
    centers = np.zeros((B, R, 3), np.float32)
    new_xyz = np.zeros((B, R * G, 3), np.float32)
    new_mask = np.ones((B, R * G), bool)

    out = group_ops.multi_ball_query_grouped(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz),
        jnp.asarray(new_mask), [(1.0, 2.0), 0.5], [4, 16],
        jnp.asarray(centers), G, cand_k=N,
    )
    shell_idx, shell_empty = out[0]
    assert not bool(shell_empty[0, 0])
    np.testing.assert_array_equal(np.sort(np.asarray(shell_idx[0, 0])), [32, 33, 34, 35])


def test_candidate_matmul_gather_matches_grouped_path():
    """The candidate-relative query + one-hot-matmul gather
    (multi_ball_query_grouped_cand + group_from_candidates) must produce
    the same neighbor sets as multi_ball_query_grouped in the balls-fit
    regime, and grouped tensors equal to group_from_idx up to the hi/lo
    bf16 coordinate split (~2^-17 relative on xyz; features bf16-cast on
    both paths downstream)."""
    rng = np.random.RandomState(7)
    B, R, G, N, C = 2, 4, 8, 64, 2
    xyz = rng.rand(B, N, 3).astype(np.float32) * 40 - 20
    mask = rng.rand(B, N) > 0.2
    feats = rng.rand(B, N, C).astype(np.float32)
    centers = rng.rand(B, R, 3).astype(np.float32) * 30 - 15
    qpts = centers[:, :, None, :] + rng.randn(B, R, G, 3).astype(np.float32)
    new_xyz = qpts.reshape(B, R * G, 3)
    new_mask = rng.rand(B, R * G) > 0.1
    radii, ns = [1.5, 3.0], [8, 16]

    ref = group_ops.multi_ball_query_grouped(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz),
        jnp.asarray(new_mask), radii, ns, jnp.asarray(centers), G, cand_k=N)
    scales, cand, cand_xyz, cand_ok = group_ops.multi_ball_query_grouped_cand(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(new_xyz),
        jnp.asarray(new_mask), radii, ns, jnp.asarray(centers), G, cand_k=N)

    hi, lo = group_ops.split_hi_lo(cand_xyz)
    grow = np.asarray(cand) + (np.arange(B) * N)[:, None, None]
    cf = feats.reshape(B * N, C)[grow.reshape(-1)].reshape(B * R, N, C)
    cand_feat = jnp.concatenate(
        [hi, lo, jnp.asarray(cf).astype(jnp.bfloat16)], axis=-1)

    for (cpos, ce), (ri, re) in zip(scales, ref):
        np.testing.assert_array_equal(np.asarray(ce), np.asarray(re))
        # map candidate positions -> global ids; sets must match where
        # not empty (first-fill slots map identically)
        got_ids = np.take_along_axis(
            np.repeat(np.asarray(cand).reshape(B * R, 1, N), G, axis=1),
            np.asarray(cpos).reshape(B * R, G, -1), axis=2).reshape(
                B, R * G, -1)
        valid = ~np.asarray(re)[..., None]
        np.testing.assert_array_equal(
            np.where(valid, got_ids, 0),
            np.where(valid, np.asarray(ri), 0))

        grouped_ref = group_ops.group_from_idx(
            jnp.asarray(xyz), jnp.asarray(new_xyz), ri, re,
            features=jnp.asarray(feats), use_xyz=True)
        grouped_got = group_ops.group_from_candidates(
            cand_feat, cpos, ce, jnp.asarray(new_xyz), use_xyz=True,
            n_feat=C)
        # xyz offsets: hi/lo split error ~|x| * 2^-17 (<= 1e-3 at 40 m);
        # features ride bf16 (rel ~0.4%)
        np.testing.assert_allclose(
            np.asarray(grouped_got[..., :3]),
            np.asarray(grouped_ref[..., :3]), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(grouped_got[..., 3:]),
            np.asarray(grouped_ref[..., 3:]), atol=8e-3)
