"""Walk ablation 3: real-shape plane, isolate DMA + body costs.

Real traced-group shape: plane words (10240, 20480) int32 (~840 MB),
window (128, 256) with 80 KB row stride.  Modes:
  nodma   : full real-ish body, band reads, no refetch ever
  dma119  : refetch every 119 steps (new tall-band cadence)
  dma18   : refetch every 18 steps (old wide-band cadence)
  decode  : nodma + the real _decode_step rules + forced carry
  six     : decode + 6-var carry + real miss computation (never true)

PYTHONPATH="/root/repo:$PYTHONPATH" timeout 560 python scripts/walk_ablate3.py
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

N = 10240            # steps per program
P = 8
M_ROWS, N_W = 10240, 20480
BAND_R, BAND_W = 128, 256


def kernel(plane_ref, out_ref, band_ref, sem, *, mode):
    pid = pl.program_id(0)

    def decode(code, fprev, eprev, forced, i, j, in_core):
        back = code // 9
        f = (code // 3) % 3
        e = code % 3
        move = jnp.where(in_core,
                         jnp.where(forced > 0, forced - 1, back),
                         jnp.where(j >= 0, 0, 2))
        force_left = jnp.logical_and(
            move == 0, jnp.logical_and(j - 1 >= 0, jnp.logical_or(
                f == 0, jnp.logical_and(f >= 1, fprev == 2))))
        force_up = jnp.logical_and(
            move == 2, jnp.logical_and(i - 1 >= 0, jnp.logical_or(
                e == 0, jnp.logical_and(e >= 1, eprev == 2))))
        return move, jnp.where(in_core, jnp.where(force_left, 1,
                                                  jnp.where(force_up, 3,
                                                            0)), 0)

    def cond(st):
        return st[0] >= 0

    def body(st):
        i, t, j, forced, bi0, wj0 = st

        if mode in ("dma119", "dma18"):
            period = 119 if mode == "dma119" else 18
            miss = t % period == 0

            def refetch(_):
                bi = pl.multiple_of(
                    jnp.clip(((i - (BAND_R - 9)) // 8) * 8, 0,
                             M_ROWS - BAND_R), 8)
                wj = pl.multiple_of(
                    jnp.clip((((j >> 2) + 128) // 128) * 128 - BAND_W,
                             0, N_W - BAND_W), 128)
                cp = pltpu.make_async_copy(
                    plane_ref.at[pl.ds(bi, BAND_R), pl.ds(wj, BAND_W)],
                    band_ref, sem)
                cp.start()
                cp.wait()
                return bi, wj

            bi0, wj0 = jax.lax.cond(miss, refetch,
                                    lambda _: (bi0, wj0), None)
        elif mode == "six":
            in_core0 = jnp.logical_and(i >= 0, j >= 0)
            miss = jnp.logical_and(in_core0, jnp.logical_or(
                jnp.logical_or(
                    jnp.logical_and(i > 0, i - 1 < bi0 - 2 * M_ROWS),
                    jnp.logical_or(i < bi0 - 2 * M_ROWS,
                                   i >= bi0 + BAND_R)),
                jnp.logical_or(
                    (jnp.maximum(j - 1, 0) >> 2) < wj0 - 2 * N_W,
                    (j >> 2) >= wj0 + BAND_W)))
            bi0 = jnp.where(miss, bi0 + 1, bi0)

        li = jnp.clip(i - bi0, 0, BAND_R - 1) if mode in (
            "dma119", "dma18") else i % BAND_R
        ww = (jnp.maximum(j, 0) >> 2) - wj0 if mode in (
            "dma119", "dma18") else (j >> 2) % BAND_W
        ww = jnp.clip(ww, 0, BAND_W - 1)
        w = band_ref[li, ww]
        code = (w >> ((j & 3) * 8)) & 0xFF
        w2 = band_ref[li, jnp.clip(ww - 1, 0, BAND_W - 1)]
        w3 = band_ref[jnp.clip(li - 1, 0, BAND_R - 1), ww]
        fprev = ((w2 >> ((j & 3) * 8)) & 0xFF) // 3 % 3
        eprev = ((w3 >> ((j & 3) * 8)) & 0xFF) % 3

        if mode in ("decode", "six", "dma119", "dma18"):
            in_core = jnp.logical_and(i >= 0, j >= 0)
            move, forced = decode(code, fprev, eprev, forced, i, j,
                                  in_core)
        else:
            move = code % 3
        out_ref[pid, t] = move
        di = jnp.where(move == 0, 0, 1)
        dj = jnp.where(move == 2, 0, 1)
        # keep i monotonically decreasing so the loop terminates
        return i - jnp.maximum(di, 1), t + 1, j - dj, forced, bi0, wj0

    st = (jnp.int32(N - 1), jnp.int32(0), jnp.int32(N - 1), jnp.int32(0),
          jnp.int32(0), jnp.int32(0))
    i, t, j, _, bi0, _ = jax.lax.while_loop(cond, body, st)
    out_ref[pid, 0] = t + bi0


@functools.partial(jax.jit, static_argnames=("mode",))
def run_mode(plane, mode):
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_shape=jax.ShapeDtypeStruct((P, N + 8), jnp.int32),
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
    plane = jnp.zeros((M_ROWS, N_W), jnp.int32)
    plane = (plane + jnp.arange(N_W, dtype=jnp.int32)[None, :]).astype(
        jnp.int32)
    print(f"plane {plane.nbytes/1e6:.0f} MB", flush=True)
    for mode in ("nodma", "decode", "six", "dma119", "dma18"):
        def run():
            out = run_mode(plane, mode)
            return int(np.asarray(out)[0, 0])
        try:
            t = best(run)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:8s}: FAILED {str(e)[:160]}", flush=True)
            continue
        per = t / (P * N) * 1e9
        print(f"{mode:8s}: {t*1e3:6.2f} ms  ({per:6.0f} ns/step)",
              flush=True)


if __name__ == "__main__":
    main()
