"""Op-cost probes: what does one pltpu.roll cost vs one add on v5e?

Runs a kernel of `steps` iterations over a (TB, K) i32 tile doing a
configurable mix of ops, grid of `tiles` programs. Reports ns/step/tile.
"""
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

TB, K, STEPS, TILES = 64, 128, 2048, 32


def make(n_rolls, n_adds, n_sels, n_mins):
    def kern(x_ref, o_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = x_ref[:]

        def step(j, c):
            a = c
            for _ in range(n_rolls):
                a = pltpu.roll(a, shift=1, axis=1)
            for i in range(n_adds):
                a = a + jnp.int32(i + 1)
            for i in range(n_sels):
                a = jnp.where(a > 0, a, jnp.int32(i))
            for i in range(n_mins):
                a = jnp.minimum(a, jnp.int32(2**29 - i))
            return a

        acc[:] = jax.lax.fori_loop(0, STEPS, step, acc[:])
        o_ref[:] = acc[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(TILES,),
            in_specs=[pl.BlockSpec((TB, K), lambda b: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TB, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TB, K), jnp.int32),
            scratch_shapes=[pltpu.VMEM((TB, K), jnp.int32)],
        )(x)

    return run


def main():
    x = jnp.asarray(np.random.RandomState(0).randint(1, 100, (TB, K)).astype(np.int32))
    cases = [
        ("0r 8a 0s 0m", 0, 8, 0, 0),
        ("0r 16a 0s 0m", 0, 16, 0, 0),
        ("0r 32a 0s 0m", 0, 32, 0, 0),
        ("8r 0a 0s 0m", 8, 0, 0, 0),
        ("4r 0a 0s 0m", 4, 0, 0, 0),
        ("8r 8a 8s 8m", 8, 8, 8, 8),
        ("0r 8a 8s 8m", 0, 8, 8, 8),
        ("0r 0a 16s 0m", 0, 0, 16, 0),
        ("0r 0a 0s 16m", 0, 0, 0, 16),
    ]
    for name, r, a, s, m in cases:
        f = make(r, a, s, m)
        np.asarray(f(x))  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        ns = best / (STEPS * TILES) * 1e9
        print(f"{name}: {best*1000:7.1f} ms  {ns:7.1f} ns/step-tile")


if __name__ == "__main__":
    main()
