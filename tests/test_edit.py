"""Scene editing: part composition with per-point Rw2c renders correctly."""
import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.edit import ScenePart, compose_parts
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.ops.spherical import sh_basis
from pointnerf_tpu.train.step import eval_step, refresh_grid

from test_render import make_batch, synthetic_scene


def _part(xyz, F, seed, R=None, t=None, **kw):
    rng = np.random.RandomState(seed)
    return ScenePart(
        xyz=xyz.astype(np.float32),
        features=rng.rand(len(xyz), F).astype(np.float32) * 0.01,
        conf=np.full((len(xyz), 1), 0.5, np.float32),
        color=rng.rand(len(xyz), 3).astype(np.float32),
        dirs=np.zeros((len(xyz), 3), np.float32),
        **({"R": R} if R is not None else {}),
        **({"t": t} if t is not None else {}), **kw)


def test_compose_identity_matches_plain():
    """A single part with identity transform renders exactly like the plain
    (global-Rw2c) path."""
    cfg = tiny_test_config()
    xyz, campos, camrot = synthetic_scene(n_pts=300)
    F = cfg.agg.point_features_dim
    part = _part(xyz, F, seed=0)
    pc, st = compose_parts([part])
    params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)
    grid = refresh_grid(pc, st, cfg)
    batch = make_batch(campos, camrot)
    out_edit = eval_step({"mlp": params, "points": pc}, st, grid, batch, cfg)

    # plain path: same cloud with global identity Rw2c
    from pointnerf_tpu.models.points import PointCloudStatic
    st2 = PointCloudStatic(num_active=st.num_active, Rw2c=jnp.eye(3))
    out_plain = eval_step({"mlp": params, "points": pc}, st2, grid, batch, cfg)
    np.testing.assert_allclose(np.asarray(out_edit.coarse_raycolor),
                               np.asarray(out_plain.coarse_raycolor),
                               rtol=1e-4, atol=1e-4)


def test_rotated_part_is_frame_invariant():
    """Rotating a part AND the camera with it must reproduce the original
    image (the per-point Rw2c maps geometry back to the training frame)."""
    cfg = tiny_test_config()
    xyz, campos, camrot = synthetic_scene(n_pts=300)
    F = cfg.agg.point_features_dim
    params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)

    base = _part(xyz, F, seed=0)
    pc0, st0 = compose_parts([base])
    grid0 = refresh_grid(pc0, st0, cfg)
    batch0 = make_batch(campos, camrot)
    ref = eval_step({"mlp": params, "points": pc0}, st0, grid0, batch0, cfg)

    # rotate the part 90 deg about y; rotate camera identically
    Rz = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    rot_part = _part(xyz, F, seed=0, R=Rz)
    pc1, st1 = compose_parts([rot_part])
    grid1 = refresh_grid(pc1, st1, cfg)
    batch1 = make_batch(Rz @ campos, Rz @ camrot)
    out = eval_step({"mlp": params, "points": pc1}, st1, grid1, batch1, cfg)

    # same rays in the rotated frame -> same image (up to voxel-grid
    # discretization of the shading-point selection)
    m = np.asarray(ref.ray_mask) & np.asarray(out.ray_mask)
    a = np.asarray(ref.coarse_raycolor)[m]
    b = np.asarray(out.coarse_raycolor)[m]
    assert m.sum() > 10
    assert np.median(np.abs(a - b)) < 0.02, np.median(np.abs(a - b))


def test_two_parts_compose():
    cfg = tiny_test_config()
    xyz, campos, camrot = synthetic_scene(n_pts=200)
    F = cfg.agg.point_features_dim
    p1 = _part(xyz * 0.5 + np.array([0.4, 0, 0], np.float32), F, seed=0)
    p2 = _part(xyz * 0.5 - np.array([0.4, 0, 0], np.float32), F, seed=1)
    pc, st = compose_parts([p1, p2])
    assert int(st.num_active) == 400
    params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)
    grid = refresh_grid(pc, st, cfg)
    out = eval_step({"mlp": params, "points": pc}, st, grid,
                    make_batch(campos, camrot), cfg)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()


def test_sh_basis_orthonormal():
    """Monte-Carlo orthonormality of the real SH basis over the sphere."""
    rng = np.random.RandomState(0)
    v = rng.normal(size=(200000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    b = np.asarray(sh_basis(3, jnp.asarray(v, jnp.float32)))  # [N, 9]
    gram = (b.T @ b) / len(v) * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_sh_recurrence_matches_closed_forms():
    """The arbitrary-degree Legendre recurrence must reproduce the
    hardcoded degree-4 closed forms exactly (same convention), and stay
    orthonormal at degree 6 (beyond the reference's default — the scipy
    machinery of utils/spherical.py:9+ covered any degree)."""
    from pointnerf_tpu.ops.spherical import _sh_basis_recurrence
    rng = np.random.RandomState(1)
    v = rng.normal(size=(4096, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    vj = jnp.asarray(v, jnp.float32)
    for deg in (1, 2, 3, 4):
        np.testing.assert_allclose(
            np.asarray(_sh_basis_recurrence(deg, vj)),
            np.asarray(sh_basis(deg, vj)), rtol=2e-5, atol=2e-6)

    v2 = rng.normal(size=(200000, 3))
    v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
    b = np.asarray(sh_basis(6, jnp.asarray(v2, jnp.float32)))  # [N, 36]
    gram = (b.T @ b) / len(v2) * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(36), atol=0.06)
