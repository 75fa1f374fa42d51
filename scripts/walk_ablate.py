"""Ablate the banded walk's per-iteration cost on TPU.

Standalone Pallas kernels with grid=(8,), each running N=10240
while_loop iterations per program, adding one piece of the real walk
body at a time:

  empty       : loop carries only (i, t); body decrements
  wr          : + moves_ref[pid, t] = const SMEM write (dynamic index)
  rd          : + one band SMEM read + shift/mask decode
  rd3         : + three band reads (code, fprev, eprev) + decode_step-ish
  cond        : + a lax.cond on a rarely-true flag (no DMA inside)
  cond_dma    : + the real refetch cond with a DMA branch (fires ~1/23
                iterations, as in the walk)

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/walk_ablate.py
"""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/tsta_jax_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 10240
P = 8
BAND_R, BAND_W = 24, 1024


def kernel(plane_ref, out_ref, band_ref, sem, *, mode):
    pid = pl.program_id(0)

    def cond(st):
        i, t, acc, bi0 = st
        return i >= 0

    def body(st):
        i, t, acc, bi0 = st

        if mode in ("cond", "cond_dma"):
            miss = i < bi0

            def refetch(_):
                if mode == "cond_dma":
                    bi = jnp.maximum(((i - 15) // 8) * 8, 0)
                    cp = pltpu.make_async_copy(
                        plane_ref.at[pl.ds(bi, BAND_R), pl.ds(0, BAND_W)],
                        band_ref, sem)
                    cp.start()
                    cp.wait()
                    return bi
                return jnp.maximum(i - 23, 0)

            bi0 = jax.lax.cond(miss, refetch, lambda _: bi0, None)

        acc2 = acc
        if mode in ("rd", "rd3", "cond", "cond_dma"):
            li = jnp.clip(i - bi0 if mode in ("cond", "cond_dma") else
                          i % BAND_R, 0, BAND_R - 1)
            w = band_ref[li, (i >> 2) % BAND_W]
            code = (w >> ((i & 3) * 8)) & 0xFF
            acc2 = acc + code
        if mode in ("rd3", "cond", "cond_dma"):
            w2 = band_ref[li, (jnp.maximum(i - 1, 0) >> 2) % BAND_W]
            w3 = band_ref[jnp.maximum(li - 1, 0), (i >> 2) % BAND_W]
            f = ((w2 >> ((i & 3) * 8)) & 0xFF) // 3 % 3
            e = ((w3 >> ((i & 3) * 8)) & 0xFF) % 3
            move = jnp.where(acc2 % 9 == 1, 1, jnp.where(f > e, 0, 2))
            acc2 = acc2 + move

        if mode != "empty":
            out_ref[pid, t] = acc2

        return i - 1, t + 1, acc2, bi0

    st = (jnp.int32(N - 1), jnp.int32(0), jnp.int32(0),
          jnp.int32(-(2 ** 30)) if mode in ("cond", "cond_dma")
          else jnp.int32(0))
    i, t, acc, _ = jax.lax.while_loop(cond, body, st)
    out_ref[pid, 0] = acc


@functools.partial(jax.jit, static_argnames=("mode",))
def run_mode(plane, mode):
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_shape=jax.ShapeDtypeStruct((P, N + 1), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((BAND_R, BAND_W), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(plane)


def best(fn, iters=4, warm=1):
    for _ in range(warm):
        fn()
    b = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    plane = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**31, (256, BAND_W),
                                          np.int64).astype(np.int32))
    for mode in ("empty", "wr", "rd", "rd3", "cond", "cond_dma"):
        def run():
            out = run_mode(plane, mode)
            return int(np.asarray(out)[0, 0])
        t = best(run)
        per = t / (P * N) * 1e9
        print(f"{mode:9s}: {t*1e3:6.2f} ms  ({per:6.0f} ns/iter)",
              flush=True)


if __name__ == "__main__":
    main()
