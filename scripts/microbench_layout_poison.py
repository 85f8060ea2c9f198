"""Micro-repro for the round-4/5 INVALID_ARGUMENT layout poison.

Sequence under test (what refresh_grid does on every point-set change):
  1. eager transpose-shaped build => column-major table
  2. jax.device_put(x, Format(row-major))  -- the _row_major pin
  3. feed it to a jitted consumer         -- compiles at t=0, runs
  4. REBUILD the table (same shapes), pin again, feed the CACHED executable

On the axon tunnel the second pinned array makes the cached executable fail
with an async INVALID_ARGUMENT (round-5 bisect: runs/repro_e4 vs e5).
This script confirms/denies the mechanism in ~2 min and A/Bs the candidate
fix: produce the row-major table from a jitted relayout with an explicit
output Format instead of an eager device_put.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

mode = sys.argv[1] if len(sys.argv) > 1 else "deviceput"

M, Q = 131072, 729


def build(seed):
    # mimic the grid build's swapaxes+reshape tail: XLA propagates the
    # transpose into a column-major output layout
    x = jnp.arange(M * Q, dtype=jnp.float32).reshape(M, Q // 3, 3) + seed
    x = x.swapaxes(1, 2)
    return x.reshape(M, Q)


from jax.experimental.layout import Format, Layout  # noqa: E402
from jax.sharding import SingleDeviceSharding  # noqa: E402

ROWMAJOR = Format(Layout(major_to_minor=(0, 1)),
                  SingleDeviceSharding(jax.devices()[0]))


def pin_deviceput(a):
    return jax.device_put(a, Format(Layout(major_to_minor=(0, 1)),
                                    a.sharding))


_relayout = jax.jit(lambda x: x, out_shardings=ROWMAJOR)


def pin_jit(a):
    return _relayout(a)


pin = {"deviceput": pin_deviceput, "jit": pin_jit, "none": lambda a: a}[mode]


@jax.jit
def consumer(x, idx):
    return jnp.sum(x[idx] * 2.0)


t0 = build(0)
print(f"[{mode}] built layout: {t0.format.layout.major_to_minor}")
t0 = pin(t0)
print(f"[{mode}] pinned layout: {t0.format.layout.major_to_minor}")
idx = jnp.arange(0, M, 7, dtype=jnp.int32)
r0 = float(consumer(t0, idx))
print(f"[{mode}] first run ok: {r0:.1f}")

t1 = build(1)
t1 = pin(t1)
try:
    r1 = float(consumer(t1, idx))
    print(f"[{mode}] second run ok: {r1:.1f}")
    x = jnp.asarray(np.ones(3))  # the next-transfer poison check
    print(f"[{mode}] post transfer ok: {float(x.sum()):.1f}")
    print("PASS")
except Exception as e:
    print(f"FAIL: {type(e).__name__}: {e}")
    sys.exit(1)
