"""Two-group optimization: shading MLPs vs neural-point payloads.

reference: NeuralPointsVolumetricModel.setup_optimizer
(models/neural_points_volumetric_model_ori.py:182-208) builds two Adams — the
MLP group at `lr` and the point group at `plr`
(models/mvs_points_volumetric_model.py:92-94) — stepped together or
alternately by `alter_step` (:210-217). Schedulers multiply lr by
`lr_decay_exp ** (it / lr_decay_iters)` (helpers/networks.py:56-61).

Here: one optax.multi_transform over the {'mlp', 'points'} partition of the
parameter pytree. Per-attribute grad toggles (xyz_grad/feat_grad/... —
neural_points.py:270-326) are applied by zeroing gradients before the update,
so prune/grow never has to rebuild optimizer state for shape reasons (state
lives on the fixed capacity buckets).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import PointNeRFConfig, PointsConfig
from ..models.points import PointCloud


def lr_schedule(base_lr: float, cfg: PointNeRFConfig):
    t = cfg.train
    if t.lr_policy == "iter_exponential_decay":
        def sched(step):
            return base_lr * t.lr_decay_exp ** (step / t.lr_decay_iters)
        return sched
    if t.lr_policy in ("none", ""):
        return base_lr
    raise ValueError(f"unsupported lr_policy {t.lr_policy}")


def make_optimizer(cfg: PointNeRFConfig) -> optax.GradientTransformation:
    return optax.multi_transform(
        {"mlp": optax.adam(lr_schedule(cfg.train.lr, cfg), b1=0.9, b2=0.999),
         "points": optax.adam(lr_schedule(cfg.train.plr, cfg), b1=0.9, b2=0.999)},
        param_labels={"mlp": "mlp", "points": "points"})


def apply_grad_flags(pc_grads: PointCloud, cfg: PointsConfig) -> PointCloud:
    """Zero gradients of frozen point attributes (neural_points.py:270-326)."""
    def z(g, on):
        return g if on else jnp.zeros_like(g)
    return PointCloud(
        xyz=z(pc_grads.xyz, cfg.xyz_grad),
        features=z(pc_grads.features, cfg.feat_grad),
        conf=z(pc_grads.conf, cfg.conf_grad),
        color=z(pc_grads.color, cfg.color_grad),
        dirs=z(pc_grads.dirs, cfg.dir_grad),
    )


def freeze_points(pc: PointCloud, cfg: PointsConfig) -> PointCloud:
    """stop_gradient on frozen attributes BEFORE the forward pass: XLA then
    drops their entire backward scatter-add (the [R*SR*K] -> [N] payload-grad
    scatters are among the most expensive ops in the step; zeroing grads
    after the fact still pays for them)."""
    def f(x, on):
        return x if on else jax.lax.stop_gradient(x)
    return PointCloud(
        xyz=f(pc.xyz, cfg.xyz_grad),
        features=f(pc.features, cfg.feat_grad),
        conf=f(pc.conf, cfg.conf_grad),
        color=f(pc.color, cfg.color_grad),
        dirs=f(pc.dirs, cfg.dir_grad),
    )


def hit_boost(hit_ema: jnp.ndarray, boost_max: float,
              pow_: float = 0.5) -> jnp.ndarray:
    """Per-point update boost for gradient-starved payloads.

    Thin geometry covers few pixels, so its points receive correspondingly
    few neighbor hits per step and their payloads converge ~hit-rate times
    slower than broad surfaces (PERF.md thicket analysis). Points whose EMA
    hit rate sits below the mean over hit-active points get their Adam
    updates scaled by clip((mean/ema)**pow_, 1, boost_max); never-hit points
    (ema == 0 — dead slots and fresh grows) stay at 1 (their grads are zero
    anyway). No reference analog.
    """
    active = hit_ema > 1e-8
    mean_ema = (jnp.sum(jnp.where(active, hit_ema, 0.0))
                / jnp.maximum(jnp.sum(active.astype(jnp.float32)), 1.0))
    boost = (mean_ema / jnp.maximum(hit_ema, 1e-8)) ** pow_
    return jnp.where(active, jnp.clip(boost, 1.0, boost_max), 1.0)


def alter_mask(step, alter_step: int):
    """(mlp_active, points_active) for the alternation schedule (_ori.py:214-217)."""
    if alter_step == 0:
        return jnp.bool_(True), jnp.bool_(True)
    phase = (step // alter_step) % 2
    return phase == 0, phase == 1


def masked_updates(updates: Dict[str, Any], mlp_on, other_on):
    """Scale update groups by the alternation mask (no-op when both on).
    The 'mlp' group follows mlp_on; every other group follows other_on
    ('points' per-scene, 'mvs' feed-forward)."""
    def scale(k):
        on = mlp_on if k == "mlp" else other_on
        return on.astype(jnp.float32)
    return {k: jax.tree.map(lambda u, s=scale(k): u * s, v)
            for k, v in updates.items()}


def alternated_update(tx: optax.GradientTransformation, grads, opt_state,
                      params, step, alter_step: int):
    """tx.update with reference-faithful alternation (_ori.py:210-217).

    The reference steps the two Adams *alternately*: on an off phase the
    inactive optimizer sees nothing — no moment decay, no bias-correction
    count advance. A plain mask over the applied updates is NOT equivalent:
    tx.update would still fold the off-phase gradients into the inactive
    group's moments and advance its count, so the group reactivates with
    contaminated state. Here the inactive group's updates are zeroed AND its
    inner optimizer state is carried through unchanged (jnp.where select on
    the multi_transform inner_states), so off phases are true no-ops for it.
    """
    if alter_step <= 0:
        return tx.update(grads, opt_state, params)
    mlp_on, other_on = alter_mask(step, alter_step)
    updates, new_opt = tx.update(grads, opt_state, params)
    updates = masked_updates(updates, mlp_on, other_on)
    inner = {}
    for k, new_s in new_opt.inner_states.items():
        on = mlp_on if k == "mlp" else other_on
        old_s = opt_state.inner_states[k]
        inner[k] = jax.tree.map(
            lambda n, o, on=on: jnp.where(on, n, o), new_s, old_s)
    return updates, new_opt._replace(inner_states=inner)
