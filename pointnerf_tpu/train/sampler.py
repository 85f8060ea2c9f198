"""Loss-aware training-ray importance sampling.

The quality bottleneck on scaled-down schedules is ray-budget allocation:
at 3,600 rays/step over 100 views of 800x800, a full epoch over the pixels
takes ~18k steps — every pixel is seen roughly once, and thin structures
(few pixels) accumulate too few gradients to converge (PERF.md thicket /
cluster failure analyses). This sampler redirects part of each batch toward
pixels whose recent training error is high.

Design (host-side, zero extra device syncs):
 - each training view gets a coarse CELL error map (cell x cell pixels per
   entry), initialized optimistically to `init` so unseen regions are
   explored first;
 - the train step already returns per-ray squared error as a device array
   (`items["per_ray_err"]`, train/step.py); the driver hands it to
   `record()` UN-materialized, and `flush()` fetches all pending errors with
   one stacked transfer per log interval (per-step host syncs round-trip the
   axon tunnel for hundreds of ms — utils/visualizer.py uses the same
   batching trick);
 - `sample_pixels()` draws a `1 - uniform_frac` fraction of the batch from
   cells proportionally to their error EMA and the rest uniformly (the
   uniform floor keeps the error maps honest everywhere and bounds the
   sampling bias).

The reference has per-ray loss masking machinery
(models/base_rendering_model.py:542-571) but always samples training rays
uniformly (data/nerf_synth360_ft_dataset.py:546-647); this lever has no
reference analog.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class ErrorMapSampler:
    """Per-view cell error maps + importance pixel sampling."""

    def __init__(self, n_views: int, wh: Tuple[int, int], cell: int = 4,
                 uniform_frac: float = 0.5, ema: float = 0.3,
                 init: float = 1.0):
        assert cell >= 1 and 0.0 <= uniform_frac <= 1.0
        W, H = wh
        self.W, self.H, self.cell = W, H, cell
        self.cw = -(-W // cell)
        self.ch = -(-H // cell)
        self.uniform_frac = uniform_frac
        self.ema = ema
        self.maps = np.full((n_views, self.ch * self.cw), init, np.float32)
        self._pending: List[Tuple[int, np.ndarray, object]] = []

    def sample_pixels(self, view: int, n: int,
                      rng: np.random.RandomState) -> np.ndarray:
        """[n, 2] int32 (x, y) pixel indices for one view."""
        n_uni = int(round(n * self.uniform_frac))
        n_imp = n - n_uni
        parts = []
        if n_uni:
            parts.append(np.stack([rng.randint(0, self.W, n_uni),
                                   rng.randint(0, self.H, n_uni)], axis=-1))
        if n_imp:
            # floor keeps the distribution valid when a view's errors have
            # decayed to exact zero everywhere
            m = self.maps[view] + 1e-12
            p = m / m.sum()
            cells = rng.choice(m.shape[0], size=n_imp, p=p)
            cy, cx = cells // self.cw, cells % self.cw
            x = np.minimum(cx * self.cell + rng.randint(0, self.cell, n_imp),
                           self.W - 1)
            y = np.minimum(cy * self.cell + rng.randint(0, self.cell, n_imp),
                           self.H - 1)
            parts.append(np.stack([x, y], axis=-1))
        return np.concatenate(parts).astype(np.int32)

    def record(self, view: Optional[int], pixel_idx, per_ray_err):
        """Queue one step's per-ray errors (device array — NOT materialized
        here; flush() batches the transfer)."""
        if view is None:
            return
        self._pending.append((int(view), np.asarray(pixel_idx, np.int64),
                              per_ray_err))
        # backstop: never hold more than 64 live device arrays even if the
        # driver's log cadence is long (live-buffer pressure on the axon
        # tunnel is the round-4 INVALID_ARGUMENT suspect class)
        if len(self._pending) >= 64:
            self.flush()

    def flush(self):
        """Materialize pending errors (one stacked transfer) and EMA them
        into the cell maps."""
        if not self._pending:
            return
        import jax.numpy as jnp
        errs = np.asarray(jnp.stack([e for _, _, e in self._pending]))
        size = self.ch * self.cw
        for (view, pix, _), err in zip(self._pending, errs):
            cells = ((pix[:, 1] // self.cell) * self.cw
                     + pix[:, 0] // self.cell)
            s = np.bincount(cells, weights=err, minlength=size)
            c = np.bincount(cells, minlength=size)
            obs = c > 0
            m = self.maps[view]
            m[obs] = ((1.0 - self.ema) * m[obs]
                      + self.ema * (s[obs] / c[obs]).astype(np.float32))
        self._pending.clear()
