"""Why is the Pallas input pipeline slow? Test stripped-down streaming variants."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=5):
    jax.tree.map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


B, N = 4096, 32768  # 512 MB int32 per input
TB, TN = 256, 2048


def variant(name, *, two_inputs=True, revisit=False, prefetch=False, dimsem=None,
            tiles=(TB, TN)):
    tb, tn = tiles
    grid = (B // tb, N // tn)

    def kernel(*refs):
        refs = list(refs)
        if prefetch:
            refs.pop(0)
        dot_ref = refs[0]
        out_ref = refs[-1]
        acc = dot_ref[0:8, 0:128]
        if two_inputs:
            acc = acc + refs[1][0:8, 0:128]
        if revisit:
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                out_ref[...] = acc

            @pl.when(j != 0)
            def _():
                out_ref[...] = out_ref[...] + acc
        else:
            out_ref[...] = acc

    in_spec = pl.BlockSpec((tb, tn), (lambda i, j, _o: (i, j)) if prefetch else (lambda i, j: (i, j)), memory_space=pltpu.VMEM)
    n_in = 2 if two_inputs else 1
    if revisit:
        out_spec = pl.BlockSpec((8, 128), (lambda i, j, _o: (i, 0)) if prefetch else (lambda i, j: (i, 0)), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((8 * grid[0], 128), jnp.int32)
    else:
        out_spec = pl.BlockSpec((8, 128), (lambda i, j, _o: (i, j)) if prefetch else (lambda i, j: (i, j)), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((8 * grid[0], 128 * grid[1]), jnp.int32)

    params = {}
    if dimsem is not None:
        params["compiler_params"] = pltpu.CompilerParams(dimension_semantics=dimsem)

    if prefetch:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[in_spec] * n_in, out_specs=out_spec,
        )
    else:
        gs = pl.GridSpec(grid=grid, in_specs=[in_spec] * n_in, out_specs=out_spec)

    @jax.jit
    def run(dot, den):
        args = [dot, den][:n_in]
        if prefetch:
            args = [jnp.zeros(1, jnp.int32)] + args
        return pl.pallas_call(kernel, grid_spec=gs, out_shape=out_shape, **params)(*args)

    return name, run


def main():
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    dot = jax.random.randint(k1, (B, N), -100, 100, dtype=jnp.int32)
    den = jax.random.randint(k2, (B, N), 0, 100, dtype=jnp.int32)
    for name, run in [
        variant("1in plain     "),
        variant("1in plain     ", two_inputs=False),
        variant("2in revisit   ", revisit=True),
        variant("2in prefetch  ", prefetch=True),
        variant("2in pre+revis ", prefetch=True, revisit=True),
        variant("2in dimsem par", dimsem=("parallel", "arbitrary")),
        variant("2in arb+arb   ", dimsem=("arbitrary", "arbitrary")),
        variant("2in tile 512x4k", tiles=(512, 4096)),
        variant("2in tile 1024x2k", tiles=(1024, 2048)),
    ]:
        try:
            dt = timeit(run, dot, den)
            gb = (2 if "1in" not in name else 1) * B * N * 4 / 1e9
            print(f"{name}: {dt*1e3:6.1f}ms  ({gb/dt:5.0f} GB/s raw, ~{gb/max(dt-0.027,1e-9):5.0f} GB/s net)", flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__} {str(ex)[:90]}", flush=True)


if __name__ == "__main__":
    main()
