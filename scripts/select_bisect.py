"""Bisect the select kernel cost: DMA vs rotation tree vs column tree."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROT_PAD = 32


def sel(n1, d1, n2, d2, *extras):
    v1 = d1 > 0
    v2 = d2 > 0
    greater = (v2 & ~v1) | (v1 & v2 & (n2 * d1 < n1 * d2))
    out = (jnp.where(greater, n2, n1), jnp.where(greater, d2, d1))
    for a1, a2 in zip(extras[::2], extras[1::2]):
        out += (jnp.where(greater, a2, a1),)
    return out


def make(mode, tile_b=8, tile_n=2048):
    def kernel(off_ref, dot_ref, den_ref, n_out, d_out, i_out):
        j = pl.program_id(1)
        zero = jnp.zeros((tile_b, 1), jnp.int32)
        if mode == "dma":
            n_out[...] = dot_ref[0:tile_b, 0:1] + den_ref[0:tile_b, 0:1]
            d_out[...] = zero
            i_out[...] = zero
            return
        dot = dot_ref[...].reshape(tile_b, N_ROT_PAD, tile_n)
        den = den_ref[...].reshape(tile_b, N_ROT_PAD, tile_n)
        num = (den - dot) >> 1
        if mode == "reshape":
            n_out[...] = num[:, 0, 0:1]
            d_out[...] = den[:, 0, 0:1]
            i_out[...] = zero
            return
        if mode in ("rot", "full"):
            k = N_ROT_PAD
            n, d = num, den
            while k > 1:
                half = k // 2
                n, d = sel(n[:, :half], d[:, :half], n[:, half:], d[:, half:])
                k = half
            n, d = n[:, 0], d[:, 0]
        else:  # col only
            n, d = num[:, 0], den[:, 0]
        if mode == "rot":
            n_out[...] = n[:, 0:1]
            d_out[...] = d[:, 0:1]
            i_out[...] = zero
            return
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_b, tile_n), 1)
            + off_ref[0]
            + j * tile_n
        )
        tn = tile_n
        while tn > 1:
            half = tn // 2
            n, d, col = sel(
                n[:, :half], d[:, :half], n[:, half:], d[:, half:],
                col[:, :half], col[:, half:],
            )
            tn = half
        n_out[...] = n.reshape(tile_b, 1)
        d_out[...] = d.reshape(tile_b, 1)
        i_out[...] = col.reshape(tile_b, 1)

    @jax.jit
    def run(dot, den, off):
        m, n_cols = dot.shape
        b = m // N_ROT_PAD
        grid = (b // tile_b, n_cols // tile_n)
        in_spec = pl.BlockSpec(
            (tile_b * N_ROT_PAD, tile_n), lambda i, j, _o: (i, j),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (tile_b, 1), lambda i, j, _o: (i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[in_spec, in_spec],
                out_specs=[out_spec] * 3,
            ),
            out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.int32)] * 3,
        )(jnp.asarray(off, jnp.int32).reshape(1), dot, den)

    return run


def timeit(fn, *args, iters=5):
    jax.tree.map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    b, n = 128, 32768
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    den = jax.random.randint(k1, (b * 32, n), 0, 12801, dtype=jnp.int32)
    dot = jax.random.randint(k2, (b * 32, n), -12800, 12801, dtype=jnp.int32)

    for mode in ("dma", "reshape", "rot", "col", "full"):
        for tiles in ((8, 2048), (4, 8192)):
            try:
                run = make(mode, *tiles)
                dt = timeit(run, dot, den, 0)
                print(f"{mode:8s} {tiles}: {dt*1e3:6.1f}ms", flush=True)
            except Exception as ex:
                print(f"{mode:8s} {tiles}: FAILED {type(ex).__name__} {str(ex)[:80]}", flush=True)


if __name__ == "__main__":
    main()
