"""Gradient-starvation levers: per-point hit counters, hit-aware pruning,
per-point update boost, and loss-aware ray importance sampling.

These are TPU-fork quality levers with no reference analog (the reference's
global prune threshold and uniform ray sampling starve thin geometry —
PERF.md cluster/thicket failure analyses). VERDICT r2 next #1.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import jit_canonical, tiny_test_config
from pointnerf_tpu.train.optim import hit_boost
from pointnerf_tpu.train.sampler import ErrorMapSampler
from pointnerf_tpu.train.step import create_train_state, loss_fn, train_step

from test_render import make_batch, setup  # noqa: F401


def _train_cfg(cfg, **kw):
    return cfg.replace(train=dataclasses.replace(cfg.train, **kw))


def _state(cfg, pc):
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    params = init_aggregator_params(jax.random.PRNGKey(7), cfg.agg)
    return create_train_state(jax.random.PRNGKey(8), params, pc, cfg)


def test_hit_counters_accumulate_and_match_neighbor_ids():
    # tracking is traced out by default (config.hits_tracked auto); force on
    cfg = tiny_test_config()
    cfg = _train_cfg(cfg, track_hits=True)
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=64)
    state = _state(cfg, pc)
    assert state.hits.shape == (pc.capacity, 3)

    # loss_fn's hit increment == the number of valid neighbor entries of an
    # identical render (same key, train=True)
    key = jax.random.PRNGKey(3)
    _, items = loss_fn(state.params, st, grid, batch, cfg, key)
    from pointnerf_tpu.models.renderer import render_rays
    out = render_rays(params, pc, st, grid, batch, cfg, key=key, train=True)
    n_valid = int(np.sum(np.asarray(out.neighbor_pidx) >= 0))
    inc = np.asarray(items["hit_inc"])
    assert inc.shape == (pc.capacity,)
    assert int(inc.sum()) == n_valid > 0
    # only active points are ever hit
    assert np.all(inc[int(st.num_active):] == 0)

    # train_step folds the increment into cumulative + EMA columns
    state2, _ = train_step(state, st, grid, batch, jit_canonical(cfg))
    hits = np.asarray(state2.hits)
    assert hits[:, 0].sum() > 0
    np.testing.assert_allclose(
        hits[:, 1], hits[:, 0] * (1.0 - cfg.train.hit_ema_decay), rtol=1e-5)


def test_hit_boost_formula():
    ema = jnp.asarray([0.0, 1.0, 1.0, 4.0])
    b = np.asarray(hit_boost(ema, boost_max=10.0, pow_=0.5))
    # active mean = (1+1+4)/3 = 2
    np.testing.assert_allclose(b, [1.0, np.sqrt(2.0), np.sqrt(2.0), 1.0],
                               rtol=1e-6)
    # clipping at boost_max
    ema = jnp.asarray([1e-6, 1.0])
    b = np.asarray(hit_boost(ema, boost_max=3.0, pow_=1.0))
    assert b[0] == 3.0


def test_hit_boost_scales_payload_updates_only():
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=64)

    feat0 = np.asarray(pc.features)

    def run(boost):
        c = _train_cfg(cfg, hit_lr_boost=boost)
        # fresh leaves: train_step donates its state (incl. the point cloud)
        s = _state(c, jax.tree.map(jnp.array, pc))
        # pre-seed a skewed EMA so some hit points sit below the mean
        ema = jnp.where(jnp.arange(pc.capacity) % 3 == 0, 0.01, 1.0)
        s = s._replace(hits=jnp.stack([ema * 10, ema], axis=-1))
        s2, _ = train_step(s, st, grid, batch, jit_canonical(c))
        return s2

    s_off = run(0.0)
    s_on = run(8.0)
    d_feat_off = np.linalg.norm(
        np.asarray(s_off.params["points"].features) - feat0, axis=-1)
    d_feat_on = np.linalg.norm(
        np.asarray(s_on.params["points"].features) - feat0, axis=-1)
    # boosted payload updates are >= the unboosted ones everywhere...
    assert np.all(d_feat_on >= d_feat_off - 1e-7)
    # ...and strictly larger for some starved (below-mean EMA) hit point
    assert np.any(d_feat_on > d_feat_off + 1e-9)
    # xyz is exempt from the boost: identical updates
    np.testing.assert_allclose(np.asarray(s_on.params["points"].xyz),
                               np.asarray(s_off.params["points"].xyz),
                               rtol=1e-6, atol=1e-7)


def test_prune_min_hits_protects_underhit_points():
    from pointnerf_tpu.data.synthetic import sphere_scene
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.train.grow import apply_prune
    cfg = _train_cfg(tiny_test_config(), prune_min_hits=5.0)
    xyz, _, _ = sphere_scene(n_pts=100)
    pc, st = make_point_cloud(xyz, jax.random.PRNGKey(0), cfg.points,
                              cfg.agg.point_features_dim)
    pc = pc._replace(conf=pc.conf.at[:50, 0].set(0.01))  # below thresh 0.1
    state = _state(cfg, pc)
    hits = np.zeros((pc.capacity, 2), np.float32)
    hits[:25, 0] = 10.0   # low conf, well-hit  -> genuinely misplaced: prune
    hits[25:50, 0] = 1.0  # low conf, under-hit -> protected
    hits[50:100, 0] = 10.0
    state = state._replace(hits=jnp.asarray(hits))
    state2, st2, kept = apply_prune(state, st, cfg)
    assert kept == 75
    # hit rows were permuted with the pack: survivors carry their counts
    h2 = np.asarray(state2.hits)
    assert int((h2[:kept, 0] == 1.0).sum()) == 25
    assert int((h2[:kept, 0] == 10.0).sum()) == 50
    assert np.all(h2[kept:] == 0)

    # floor 0 restores reference behavior: under-hit points die
    cfg0 = _train_cfg(cfg, prune_min_hits=0.0)
    _, _, kept0 = apply_prune(state, st, cfg0)
    assert kept0 == 50


def test_error_map_sampler_concentrates_and_updates():
    rng = np.random.RandomState(0)
    s = ErrorMapSampler(n_views=2, wh=(64, 48), cell=4, uniform_frac=0.25,
                        ema=0.5, init=1.0)
    pix = s.sample_pixels(0, 256, rng)
    assert pix.shape == (256, 2)
    assert pix[:, 0].min() >= 0 and pix[:, 0].max() < 64
    assert pix[:, 1].min() >= 0 and pix[:, 1].max() < 48

    # record zero error everywhere except one hot cell; maps EMA toward it
    xs, ys = np.meshgrid(np.arange(64), np.arange(48))
    allpix = np.stack([xs.ravel(), ys.ravel()], -1)
    err = np.zeros(allpix.shape[0], np.float32)
    hot = (allpix[:, 0] < 4) & (allpix[:, 1] < 4)  # cell (0, 0)
    err[hot] = 10.0
    s.record(0, allpix, jnp.asarray(err))
    s.flush()
    m = s.maps[0].reshape(s.ch, s.cw)
    assert m[0, 0] == 5.5                    # 0.5*1 + 0.5*10
    assert np.allclose(m.reshape(-1)[1:], 0.5)  # 0.5*1 + 0.5*0

    # sampling now concentrates on the hot cell
    pix = s.sample_pixels(0, 4000, rng)
    frac_hot = np.mean((pix[:, 0] < 4) & (pix[:, 1] < 4))
    # importance share: p(hot) ~ 5.5/(5.5 + 191*0.5) ~ 0.054 of 75% + tiny
    # uniform share; far above the uniform 1/192
    assert frac_hot > 8.0 / 192.0
    # unseen view keeps its optimistic uniform map
    assert np.all(s.maps[1] == 1.0)


def test_per_ray_err_matches_mse():
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=64)
    key = jax.random.PRNGKey(5)
    _, items = loss_fn({"mlp": params, "points": pc}, st, grid, batch, cfg,
                       key)
    from pointnerf_tpu.models.renderer import render_rays
    out = render_rays(params, pc, st, grid, batch, cfg, key=key, train=True)
    want = np.mean((np.asarray(out.coarse_raycolor)
                    - np.asarray(batch.gt_image)) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(items["per_ray_err"]), want,
                               rtol=1e-5, atol=1e-7)


def test_jit_canonical_zeroes_prune_min_hits_keeps_boost():
    cfg = _train_cfg(tiny_test_config(), prune_min_hits=7.0, hit_lr_boost=4.0)
    c = jit_canonical(cfg)
    assert c.train.prune_min_hits == 0.0       # prune-time only: not a jit key
    assert c.train.hit_lr_boost == 4.0         # enters the compiled step


def test_driver_integration_importance_sampler(tmp_path):
    """train_scene feeds per-ray errors back to the sampler and the sampler's
    pixel picks drive the batches (end-to-end on the tiny synthetic scene)."""
    from pointnerf_tpu.data.synthetic import ring_cameras, view_ray_batch
    from pointnerf_tpu.data.synthetic import sphere_scene
    from pointnerf_tpu.train.driver import train_scene
    from pointnerf_tpu.train.sampler import ErrorMapSampler

    cfg = tiny_test_config()
    cfg = _train_cfg(cfg, maximum_step=12, prune_iter=0, prob_freq=0,
                     test_freq=0, print_freq=4, save_iter_freq=12,
                     random_sample_size=8, hit_lr_boost=4.0)
    wh = (32, 32)
    xyz, color, normals = sphere_scene(n_pts=512)
    views = ring_cameras(n_views=3, wh=wh, focal=float(wh[0]))
    sampler = ErrorMapSampler(len(views), wh, cell=4, uniform_frac=0.5)
    rng = np.random.RandomState(0)
    picks = []

    def train_item(step):
        i = rng.randint(0, len(views))
        campos, rot, K = views[i]
        pix = sampler.sample_pixels(i, 64, rng)
        picks.append(pix)
        item = view_ray_batch(campos, rot, K, wh, n_rays=64, seed=step)
        from pointnerf_tpu.camera import get_dtu_raydir
        raydir = get_dtu_raydir(pix.astype(np.float32), K, rot,
                                True).astype(np.float32)
        from pointnerf_tpu.data.synthetic import sphere_gt_render
        return {"campos": campos, "camrotc2w": rot, "raydir": raydir,
                "pixel_idx": pix, "gt_image": sphere_gt_render(campos, raydir),
                "id": i}

    state, st, hist = train_scene(
        cfg, (xyz, color, normals), train_item, [], [], wh,
        run_dir=str(tmp_path / "run"), max_steps=12, sampler=sampler)
    # per-ray errors were recorded and flushed into the maps: some cells
    # moved off the optimistic init
    sampler.flush()
    assert picks and (sampler.maps != 1.0).any()
    # hit counters accumulated through the real driver loop
    assert float(np.asarray(state.hits)[:, 0].sum()) > 0
