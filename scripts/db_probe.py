"""Probe Mosaic support for the double-buffered walk band:
(a) 4-D SMEM scratch, (b) DMA into band.at[buf] with traced buf,
(c) DMA semaphore array indexed by traced scalar, (d) scalar reads
band[buf, li, sg, lane].  Run on TPU from /root/repo."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR","/root/.cache/tsta_jax_tpu")
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, WS, L = 8, 8, 128

def kern(x_ref, out_ref, band_ref, sems):
    def fetch(buf, bi):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(bi, R), pl.ds(0, WS), :],
            band_ref.at[buf], sems.at[buf])
        cp.start(); cp.wait()
    fetch(jnp.int32(0), jnp.int32(0))
    fetch(jnp.int32(1), jnp.int32(R))
    # scalar reads with dynamic leading index
    def body(t, acc):
        buf = t & 1
        v = band_ref[buf, t % R, (t * 7) % WS, (t * 13) % L]
        return acc + v
    acc = jax.lax.fori_loop(0, 64, body, jnp.int32(0))
    out_ref[0, 0] = acc

x = np.arange(2 * R * WS * L, dtype=np.int32).reshape(2 * R, WS, L)
out = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    scratch_shapes=[pltpu.SMEM((2, R, WS, L), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,))],
)(x)
# reference
acc = 0
for t in range(64):
    buf = t & 1
    acc += x[buf * R + t % R, (t * 7) % WS, (t * 13) % L]
print("device:", int(out[0, 0]), "expect:", acc, "OK" if int(out[0,0])==acc else "MISMATCH")
