"""Walk cost ablation, part 2: loop structure.

Modes:
  while_empty : baseline minimal while_loop (519 ns/iter measured)
  fori_empty  : fori_loop same trip count
  unroll4/8   : while_loop with 4/8 decode+write steps per body
  cond_dma    : + refetch cond with a real DMA branch (aligned), 1/23
  full_unroll8: unroll8 + cond_dma + 3 reads per step (the real body
                shape, 8 steps per iteration)

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/walk_ablate2.py
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

N = 163840
P = 8
BAND_R, BAND_W = 24, 1024


def kernel(plane_ref, out_ref, band_ref, sem, *, mode):
    pid = pl.program_id(0)

    def read_step(i, t, acc, bi0):
        li = jnp.clip(i - bi0, 0, BAND_R - 1)
        w = band_ref[li, (i >> 2) % BAND_W]
        code = (w >> ((i & 3) * 8)) & 0xFF
        w2 = band_ref[li, (jnp.maximum(i - 1, 0) >> 2) % BAND_W]
        w3 = band_ref[jnp.maximum(li - 1, 0), (i >> 2) % BAND_W]
        f = ((w2 >> ((i & 3) * 8)) & 0xFF) // 3 % 3
        e = ((w3 >> ((i & 3) * 8)) & 0xFF) % 3
        move = jnp.where(code % 9 == 1, 1, jnp.where(f > e, 0, 2))
        out_ref[pid, t % 10240] = acc + move
        return acc + move

    def dma_cond(i, bi0):
        miss = i < bi0

        def refetch(_):
            bi = pl.multiple_of(
                jnp.clip((((i % 224) - 15) // 8) * 8, 0, 256 - BAND_R), 8)
            cp = pltpu.make_async_copy(
                plane_ref.at[pl.ds(bi, BAND_R), pl.ds(0, BAND_W)],
                band_ref, sem)
            cp.start()
            cp.wait()
            return bi

        return jax.lax.cond(miss, refetch, lambda _: bi0, None)

    if mode == "fori_empty":
        def fbody(k, st):
            i, t, acc = st
            return i - 1, t + 1, acc + 1
        i, t, acc = jax.lax.fori_loop(
            0, N, fbody, (jnp.int32(N - 1), jnp.int32(0), jnp.int32(0)))
        out_ref[pid, 0] = acc
        return

    U = {"while_empty": 1, "unroll4": 4, "unroll8": 8,
         "cond_dma": 1, "full_unroll8": 8}[mode]

    def cond(st):
        i, t, acc, bi0 = st
        return i >= 0

    def body(st):
        i, t, acc, bi0 = st
        if mode in ("cond_dma", "full_unroll8"):
            bi0 = dma_cond(i, bi0)
        for k in range(U):
            if mode in ("unroll4", "unroll8"):
                out_ref[pid, (t + k) % 10240] = acc
                acc = acc + 1
            elif mode == "full_unroll8":
                acc = read_step(i - k, t + k, acc, bi0)
            else:
                acc = acc + 1
        return i - U, t + U, acc, bi0

    st = (jnp.int32(N - 1), jnp.int32(0), jnp.int32(0),
          jnp.int32(-(2 ** 30))
          if mode in ("cond_dma", "full_unroll8") else jnp.int32(0))
    i, t, acc, _ = jax.lax.while_loop(cond, body, st)
    out_ref[pid, 0] = acc


@functools.partial(jax.jit, static_argnames=("mode",))
def run_mode(plane, mode):
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_shape=jax.ShapeDtypeStruct((P, 10248), jnp.int32),
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
    for mode in ("while_empty", "fori_empty", "unroll4", "unroll8",
                 "cond_dma", "full_unroll8"):
        def run():
            out = run_mode(plane, mode)
            return int(np.asarray(out)[0, 0])
        try:
            t = best(run)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:12s}: FAILED {str(e)[:120]}", flush=True)
            continue
        per = t / (P * N) * 1e9
        print(f"{mode:12s}: {t*1e3:6.2f} ms  ({per:6.0f} ns/step)",
              flush=True)


if __name__ == "__main__":
    main()
