"""Morph from the fast streaming probe (33ms) to the real select kernel to find
which ingredient kills pipeline throughput."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N = 4096, 32768
TB, TN = 256, 2048  # input block; tile_b = TB // 32 = 8
TILE_B = 8
LANES = 128


def keep_first(n1, d1, n2, d2, *extras):
    v1 = d1 > 0
    v2 = d2 > 0
    greater = (v2 & ~v1) | (v1 & v2 & (n2 * d1 < n1 * d2))
    out = (jnp.where(greater, n2, n1), jnp.where(greater, d2, d1))
    for a1, a2 in zip(extras[::2], extras[1::2]):
        out += (jnp.where(greater, a2, a1),)
    return out


def make(stage):
    n_outs = 3 if stage >= 1 else 1
    n_scratch = 3 if stage >= 2 else 0

    def kernel(*refs):
        dot_ref, den_ref = refs[0], refs[1]
        outs = refs[2 : 2 + n_outs]
        scratch = refs[2 + n_outs :]
        j = pl.program_id(1)

        if stage <= 2:
            acc = dot_ref[0:TILE_B, 0:LANES] + den_ref[0:TILE_B, 0:LANES]
            if n_scratch:
                @pl.when(j == 0)
                def _():
                    for s in scratch:
                        s[...] = acc

                @pl.when(j != 0)
                def _():
                    for s in scratch:
                        s[...] = s[...] + acc

                @pl.when(j == pl.num_programs(1) - 1)
                def _():
                    for o, s in zip(outs, scratch):
                        o[...] = s[...]
            else:
                @pl.when(j == 0)
                def _():
                    for o in outs:
                        o[...] = acc

                @pl.when(j != 0)
                def _():
                    for o in outs:
                        o[...] = o[...] + acc
            return

        # stage >= 3: real compute
        dot = dot_ref[...].reshape(TILE_B, 32, TN)
        den = den_ref[...].reshape(TILE_B, 32, TN)
        num = (den - dot) >> 1
        if stage == 3:  # reshape + trivial reduce only (sum over rotations, lanes)
            v = (num + den).sum(axis=1)[:, 0:LANES]
            n, d, idx = v, v, v
        else:
            k = 32
            n, d = num, den
            while k > 1:
                half = k // 2
                n, d = keep_first(n[:, :half], d[:, :half], n[:, half:], d[:, half:])
                k = half
            n, d = n[:, 0], d[:, 0]
            if stage == 4:  # rotation tree only
                n, d, idx = n[:, 0:LANES], d[:, 0:LANES], n[:, 0:LANES]
            else:  # stage 5: + column tree to lanes
                col = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, TN), 1) + j * TN
                tn = TN
                while tn > LANES:
                    half = tn // 2
                    n, d, col = keep_first(
                        n[:, :half], d[:, :half], n[:, half:], d[:, half:],
                        col[:, :half], col[:, half:],
                    )
                    tn = half
                idx = col

        @pl.when(j == 0)
        def _():
            for s, v in zip(scratch, (n, d, idx)):
                s[...] = v

        @pl.when(j != 0)
        def _():
            ns, ds, idxs = (s[...] for s in scratch)
            nv, dv, iv = keep_first(ns, ds, n, d, idxs, idx)
            for s, v in zip(scratch, (nv, dv, iv)):
                s[...] = v

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            for o, s in zip(outs, scratch):
                o[...] = s[...]

    grid = (B // TB, N // TN)
    in_spec = pl.BlockSpec((TB, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_B, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((TILE_B * grid[0], LANES), jnp.int32)] * n_outs
    if n_outs == 1:
        out_shape = out_shape[0]

    @jax.jit
    def run(dot, den):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_spec, in_spec],
            out_specs=[out_spec] * n_outs if n_outs > 1 else out_spec,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((TILE_B, LANES), jnp.int32)] * n_scratch,
        )(dot, den)

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
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    dot = jax.random.randint(k1, (B, N), -100, 100, dtype=jnp.int32)
    den = jax.random.randint(k2, (B, N), 0, 100, dtype=jnp.int32)
    names = {
        0: "1 out, revisit         ",
        1: "3 outs, revisit        ",
        2: "3 outs + 3 scratch     ",
        3: "+ reshape/rot-sum      ",
        4: "+ rotation select tree ",
        5: "+ column tree (full)   ",
    }
    for stage in range(6):
        try:
            run = make(stage)
            dt = timeit(run, dot, den)
            print(f"stage {stage} {names[stage]}: {dt*1e3:6.1f}ms", flush=True)
        except Exception as ex:
            print(f"stage {stage} {names[stage]}: FAILED {type(ex).__name__} {str(ex)[:90]}", flush=True)


if __name__ == "__main__":
    main()


def make2(label, *, scratch=0, compute=False, prefetch=False, out_lanes=LANES):
    def kernel(*refs):
        refs = list(refs)
        if prefetch:
            refs.pop(0)
        dot_ref, den_ref, out_ref = refs[0], refs[1], refs[2]
        scr = refs[3:]
        j = pl.program_id(1)
        if compute:
            dot = dot_ref[...].reshape(TILE_B, 32, TN)
            den = den_ref[...].reshape(TILE_B, 32, TN)
            num = (den - dot) >> 1
            k = 32
            n, d = num, den
            while k > 1:
                half = k // 2
                n, d = keep_first(n[:, :half], d[:, :half], n[:, half:], d[:, half:])
                k = half
            n, d = n[:, 0], d[:, 0]
            col = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, TN), 1) + j * TN
            tn = TN
            while tn > LANES:
                half = tn // 2
                n, d, col = keep_first(
                    n[:, :half], d[:, :half], n[:, half:], d[:, half:],
                    col[:, :half], col[:, half:],
                )
                tn = half
            vals = (n, d, col)
        else:
            a = dot_ref[0:TILE_B, 0:LANES] + den_ref[0:TILE_B, 0:LANES]
            vals = (a, a, a)
        if scr:
            @pl.when(j == 0)
            def _():
                for s, v in zip(scr, vals):
                    s[...] = v

            @pl.when(j != 0)
            def _():
                if compute:
                    ns, ds, idxs = (s[...] for s in scr)
                    nv, dv, iv = keep_first(ns, ds, vals[0], vals[1], idxs, vals[2])
                    for s, v in zip(scr, (nv, dv, iv)):
                        s[...] = v
                else:
                    for s, v in zip(scr, vals):
                        s[...] = s[...] + v

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                out_ref[...] = jnp.concatenate(
                    [jnp.broadcast_to(s[...], (TILE_B, LANES)) for s in scr], axis=1
                )[:, :out_lanes]
        else:
            @pl.when(j == 0)
            def _():
                out_ref[...] = jnp.concatenate(
                    [jnp.broadcast_to(v[:, :LANES] if v.shape[1] >= LANES else v, (TILE_B, LANES)) for v in vals],
                    axis=1)[:, :out_lanes]

            @pl.when(j != 0)
            def _():
                out_ref[...] = out_ref[...]

    grid = (B // TB, N // TN)
    if prefetch:
        in_spec = pl.BlockSpec((TB, TN), lambda i, j, _o: (i, j), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TILE_B, out_lanes), lambda i, j, _o: (i, 0), memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((TB, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TILE_B, out_lanes), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((TILE_B * grid[0], out_lanes), jnp.int32)

    @jax.jit
    def run(dot, den):
        args = [dot, den]
        kwargs = dict(
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((TILE_B, LANES), jnp.int32)] * scratch,
        )
        if prefetch:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=[in_spec, in_spec], out_specs=out_spec,
                scratch_shapes=kwargs.pop("scratch_shapes"),
            )
            return pl.pallas_call(kernel, grid_spec=gs, out_shape=out_shape)(
                jnp.zeros(1, jnp.int32), *args)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=[in_spec, in_spec], out_specs=out_spec, **kwargs
        )(*args)

    return label, run


def main2():
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    dot = jax.random.randint(k1, (B, N), -100, 100, dtype=jnp.int32)
    den = jax.random.randint(k2, (B, N), 0, 100, dtype=jnp.int32)
    for label, run in [
        make2("1out trivial             "),
        make2("1out +3scratch           ", scratch=3),
        make2("1out +3scratch +compute  ", scratch=3, compute=True),
        make2("1out(384) +3scr +compute ", scratch=3, compute=True, out_lanes=3*LANES),
        make2("  + prefetch (=select)   ", scratch=3, compute=True, out_lanes=3*LANES, prefetch=True),
    ]:
        try:
            dt = timeit(run, dot, den)
            print(f"{label}: {dt*1e3:6.1f}ms", flush=True)
        except Exception as ex:
            print(f"{label}: FAILED {type(ex).__name__} {str(ex)[:90]}", flush=True)


if __name__ == "__main__":
    pass


def main3():
    import functools
    from mpc_iris_tpu.ops.select_pallas import select_chunk
    from mpc_iris_tpu.ops.decode import _frac_select

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    dot = jax.random.randint(k1, (B, N), -100, 100, dtype=jnp.int32)
    den = jax.random.randint(k2, (B, N), 0, 100, dtype=jnp.int32)

    # real select_chunk
    f = jax.jit(functools.partial(select_chunk, tile_b=8, tile_n=2048))
    dt = timeit(f, dot, den, 0)
    print(f"real select_chunk        : {dt*1e3:6.1f}ms", flush=True)

    # make2 "=select" + final lane tree
    def make3(label, lane_tree):
        def kernel(off_ref, dot_ref, den_ref, out_ref, *scr):
            j = pl.program_id(1)
            dotv = dot_ref[...].reshape(TILE_B, 32, TN)
            denv = den_ref[...].reshape(TILE_B, 32, TN)
            num = (denv - dotv) >> 1
            k = 32
            n, d = num, denv
            while k > 1:
                half = k // 2
                n, d = keep_first(n[:, :half], d[:, :half], n[:, half:], d[:, half:])
                k = half
            n, d = n[:, 0], d[:, 0]
            col = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, TN), 1) + off_ref[0] + j * TN
            tn = TN
            while tn > LANES:
                half = tn // 2
                n, d, col = keep_first(
                    n[:, :half], d[:, :half], n[:, half:], d[:, half:],
                    col[:, :half], col[:, half:],
                )
                tn = half

            @pl.when(j == 0)
            def _():
                for s, v in zip(scr, (n, d, col)):
                    s[...] = v

            @pl.when(j != 0)
            def _():
                ns, ds, idxs = (s[...] for s in scr)
                nv, dv, iv = keep_first(ns, ds, n, d, idxs, col)
                for s, v in zip(scr, (nv, dv, iv)):
                    s[...] = v

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                nn, dd, ii = (s[...] for s in scr)
                if lane_tree:
                    w = LANES
                    while w > 1:
                        half = w // 2
                        nn, dd, ii = _frac_select(
                            nn[:, :half], dd[:, :half], ii[:, :half],
                            nn[:, half:], dd[:, half:], ii[:, half:],
                        )
                        w = half
                out_ref[...] = jnp.concatenate(
                    [jnp.broadcast_to(v, (TILE_B, LANES)) for v in (nn, dd, ii)], axis=1
                )

        grid = (B // TB, N // TN)
        in_spec = pl.BlockSpec((TB, TN), lambda i, j, _o: (i, j), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TILE_B, 3 * LANES), lambda i, j, _o: (i, 0), memory_space=pltpu.VMEM)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[in_spec, in_spec], out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TILE_B, LANES), jnp.int32)] * 3,
        )

        @jax.jit
        def run(dot, den):
            return pl.pallas_call(
                kernel, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((TILE_B * grid[0], 3 * LANES), jnp.int32),
            )(jnp.zeros(1, jnp.int32), dot, den)

        dt = timeit(run, dot, den)
        print(f"{label}: {dt*1e3:6.1f}ms", flush=True)

    make3("replica, no lane tree    ", False)
    make3("replica, with lane tree  ", True)


def main4():
    import functools
    from mpc_iris_tpu.ops.select_pallas import select_chunk

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    dot = jax.random.randint(k1, (B, N), -100, 100, dtype=jnp.int32)
    den = jax.random.randint(k2, (B, N), 0, 100, dtype=jnp.int32)

    @jax.jit
    def one_out(dot, den):
        n, d, i = select_chunk(dot, den, 0, tile_b=8, tile_n=2048)
        return jnp.stack([n, d, i])

    dt = timeit(one_out, dot, den)
    print(f"select_chunk stacked->1 output: {dt*1e3:6.1f}ms", flush=True)
