"""Probe Mosaic's elementwise-max lowering cost per dtype on v5e:
int32 vs int16 vs uint16 vs int8 vs uint8 on full-width vregs.

The difference method's 2-4x density lever hinges on a 1-op narrow
max; r3/r4 found SIGNED i16 max missing (9-op SWAR).  Differences can
be biased to UNSIGNED, so if maxu lowers natively the lever opens.

Run: PYTHONPATH=/root/repo:$PYTHONPATH timeout 500 python scripts/dtype_max_probe.py
"""
import os, functools, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR","/root/.cache/tsta_jax_tpu")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, L, ITERS = 256, 128, 2000

def make(dtype):
    def kern(x_ref, y_ref, o_ref):
        x = x_ref[...]
        y = y_ref[...]
        def body(k, c):
            # chain of dependent maxes so nothing folds away
            return jnp.maximum(jnp.maximum(c, y), x + c.dtype.type(0))
        def body2(k, c):
            c = jnp.maximum(c, y)
            c = jnp.maximum(c, x)
            c = jnp.maximum(c, y)
            c = jnp.maximum(c, x)
            return c
        o_ref[...] = jax.lax.fori_loop(0, ITERS, body2, x)
    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ROWS, L), dtype),
        )(x, y)
    return run

def best(fn, *a, iters=5):
    fn(*a).block_until_ready()
    r = fn(*a); _ = np.asarray(r)   # tunnel sync
    b = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*a))
        b = min(b, time.perf_counter() - t0)
    return b

rng = np.random.default_rng(0)
base = None
for dt in (jnp.int32, jnp.int16, jnp.uint16, jnp.int8, jnp.uint8):
    info = np.iinfo(np.dtype(dt))
    x = jnp.asarray(rng.integers(info.min, info.max, (ROWS, L)), dt)
    y = jnp.asarray(rng.integers(info.min, info.max, (ROWS, L)), dt)
    try:
        t = best(make(dt), x, y)
        lanes = (np.dtype(dt).itemsize * 8)
        per_op = t / (ITERS * 4)
        msg = f"{np.dtype(dt).name:7s}: {t*1e3:7.2f} ms  ({per_op*1e9:6.1f} ns/max of (256,128))"
        if base is None:
            base = t
            msg += "  [baseline]"
        else:
            msg += f"  {base/t:4.2f}x vs int32"
        print(msg, flush=True)
    except Exception as e:
        print(f"{np.dtype(dt).name:7s}: FAILED {str(e)[:120]}", flush=True)
