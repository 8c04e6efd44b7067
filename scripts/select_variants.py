"""Compare-op variants for the fused select kernel (TPU probe).

A: int32 cross products (current)
B: f32 cross products (INEXACT — lower bound for f32 path cost)
C: f32 split-exact cross products (exact sign via d = 128*d_hi + d_lo splitting)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROT_PAD = 32


def sel_i32(n1, d1, n2, d2, *extras):
    v1 = d1 > 0
    v2 = d2 > 0
    greater = (v2 & ~v1) | (v1 & v2 & (n2 * d1 < n1 * d2))
    out = (jnp.where(greater, n2, n1), jnp.where(greater, d2, d1))
    for a1, a2 in zip(extras[::2], extras[1::2]):
        out += (jnp.where(greater, a2, a1),)
    return out


def sel_f32(n1, d1, n2, d2, *extras):
    f = jnp.float32
    v1 = d1 > 0
    v2 = d2 > 0
    p1 = n1.astype(f) * d2.astype(f)
    p2 = n2.astype(f) * d1.astype(f)
    greater = (v2 & ~v1) | (v1 & v2 & (p2 < p1))
    out = (jnp.where(greater, n2, n1), jnp.where(greater, d2, d1))
    for a1, a2 in zip(extras[::2], extras[1::2]):
        out += (jnp.where(greater, a2, a1),)
    return out


def sel_f32_exact(n1, d1, n2, d2, *extras):
    # d = 128*hi + lo with hi, lo < 2^7; n < 2^14 -> all partial products < 2^21
    # exact in f32; (hi-part diff)*128 is a pow-2 scale (exact); the final add's
    # rounding is monotone and sign-preserving, so the comparison is exact.
    f = jnp.float32
    n1f, n2f = n1.astype(f), n2.astype(f)
    d1f, d2f = d1.astype(f), d2.astype(f)
    d1hi = jnp.floor(d1f * (1.0 / 128.0))
    d2hi = jnp.floor(d2f * (1.0 / 128.0))
    d1lo = d1f - d1hi * 128.0
    d2lo = d2f - d2hi * 128.0
    hi = n2f * d1hi - n1f * d2hi
    lo = n2f * d1lo - n1f * d2lo
    diff = hi * 128.0 + lo  # sign(diff) == sign(n2*d1 - n1*d2)
    v1 = d1 > 0
    v2 = d2 > 0
    greater = (v2 & ~v1) | (v1 & v2 & (diff < 0))
    out = (jnp.where(greater, n2, n1), jnp.where(greater, d2, d1))
    for a1, a2 in zip(extras[::2], extras[1::2]):
        out += (jnp.where(greater, a2, a1),)
    return out


def make_select(sel, tile_b=8, tile_n=2048):
    def kernel(off_ref, dot_ref, den_ref, n_out, d_out, i_out):
        j = pl.program_id(1)
        dot = dot_ref[...].reshape(tile_b, N_ROT_PAD, tile_n)
        den = den_ref[...].reshape(tile_b, N_ROT_PAD, tile_n)
        num = (den - dot) >> 1
        k = N_ROT_PAD
        n, d = num, den
        while k > 1:
            half = k // 2
            n, d = sel(n[:, :half], d[:, :half], n[:, half:], d[:, half:])
            k = half
        n, d = n[:, 0], d[:, 0]
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
        nv, dv, iv = n.reshape(tile_b, 1), d.reshape(tile_b, 1), col.reshape(tile_b, 1)

        @pl.when(j == 0)
        def _():
            n_out[...], d_out[...], i_out[...] = nv, dv, iv

        @pl.when(j != 0)
        def _():
            n_out[...], d_out[...], i_out[...] = sel(
                n_out[...], d_out[...], nv, dv, i_out[...], iv
            )

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
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[in_spec, in_spec],
                out_specs=[out_spec] * 3,
            ),
            out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.int32)] * 3,
        )(jnp.asarray(off, jnp.int32).reshape(1), dot, den)
        return outs

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
    num = jax.random.randint(k2, (b * 32, n), 0, 12801, dtype=jnp.int32)
    num = jnp.minimum(num, den)
    dot = den - 2 * num  # so kernel's (den-dot)>>1 reproduces num

    ref = None
    for name, sel in [("i32", sel_i32), ("f32~", sel_f32), ("f32x", sel_f32_exact)]:
        run = make_select(sel)
        out = [np.asarray(x) for x in run(dot, den, 0)]
        dt = timeit(run, dot, den, 0)
        match = "?" if ref is None else str(all(np.array_equal(a, b) for a, b in zip(ref, out)))
        if ref is None:
            ref = out
        print(f"{name}: {dt*1e3:.1f}ms (incl ~27ms dispatch)  match_i32={match}", flush=True)


if __name__ == "__main__":
    main()
