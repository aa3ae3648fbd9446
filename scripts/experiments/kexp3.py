"""Probe 2: sublane-axis rolls vs lane-axis rolls, and loop-overhead vs
unroll factor, on v5e."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS, TILES = 2048, 32


def make(shape, axis, n_rolls, n_adds, unroll):
    def kern(x_ref, o_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = x_ref[:]

        def one(a):
            for _ in range(n_rolls):
                a = pltpu.roll(a, shift=1, axis=axis)
            for i in range(n_adds):
                a = a + jnp.int32(i + 1)
            return a

        def step(j, c):
            for _ in range(unroll):
                c = one(c)
            return c

        acc[:] = jax.lax.fori_loop(0, STEPS // unroll, step, acc[:])
        o_ref[:] = acc[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(TILES,),
            in_specs=[pl.BlockSpec(shape, lambda b: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            scratch_shapes=[pltpu.VMEM(shape, jnp.int32)],
        )(x)

    return run


def main():
    rng = np.random.RandomState(0)
    cases = [
        # (name, shape, axis, rolls, adds, unroll)
        ("lane  (64,128) 8r u1", (64, 128), 1, 8, 8, 1),
        ("subl  (128,64) 8r u1", (128, 64), 0, 8, 8, 1),
        ("subl (128,128) 8r u1", (128, 128), 0, 8, 8, 1),
        ("lane  (64,128) 8r u4", (64, 128), 1, 8, 8, 4),
        ("subl (128,128) 8r u4", (128, 128), 0, 8, 8, 4),
        ("subl (128,128) 8r u8", (128, 128), 0, 8, 8, 8),
        ("lane  (64,128) 0r u4", (64, 128), 1, 0, 8, 4),
        ("lane  (64,128) 0r u8", (64, 128), 1, 0, 8, 8),
        ("subl (128,128) 0r u1", (128, 128), 0, 0, 8, 1),
    ]
    for name, shape, axis, r, a, u in cases:
        x = jnp.asarray(rng.randint(1, 100, shape).astype(np.int32))
        try:
            f = make(shape, axis, r, a, u)
            np.asarray(f(x))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        ns = best / (STEPS * TILES) * 1e9
        print(f"{name}: {best*1000:7.1f} ms  {ns:7.1f} ns/step-tile")


if __name__ == "__main__":
    main()
