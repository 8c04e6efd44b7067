"""One-command TPU-path smoke: everything the CPU test suite CANNOT cover.

Run on the real TPU (axon): engine construction (runtime kernel canary on the
int4/int16 paths), fused-Pallas vs XLA selection parity, packed vs dense
storage parity, and a self-match end-to-end check. ~2-3 minutes including
compiles. Exits non-zero on any mismatch.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_smoke.py
"""

import sys
import time

import numpy as np


def main() -> int:
    import jax

    from mpc_iris_tpu.utils.config import enable_compile_cache

    enable_compile_cache()

    if jax.default_backend() != "tpu":
        print(f"WARNING: backend is {jax.default_backend()}, not tpu — this "
              "smoke only proves something on real hardware", file=sys.stderr)

    from mpc_iris_tpu.models.engines import (
        PlaintextEngine,
        ShareEngine,
        MasksEngine,
        _match_scan,
        _match_scan_fused,
        prepare_query_planes,
    )

    t0 = time.monotonic()
    rng = np.random.default_rng(3)
    n, b = 4096, 8
    dpat = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    dmsk = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    idx = rng.integers(0, n, size=b)
    qpat, qmsk = dpat[idx].copy(), dmsk[idx].copy()

    # 1. engine construction runs the kernel canary (int4 + int16 wrap paths)
    dense = PlaintextEngine(dpat, dmsk, chunk=2048, storage="dense")
    print(f"[1] engines + kernel canary OK ({time.monotonic()-t0:.0f}s)")

    # 2. fused Pallas selection == XLA selection on-device
    q_enc, q_mask = prepare_query_planes(qpat, qmsk)
    ref = np.asarray(_match_scan(q_enc, q_mask, dense.db_enc, dense.db_mask))
    got = np.asarray(_match_scan_fused(q_enc, q_mask, dense.db_enc, dense.db_mask))
    assert np.array_equal(ref, got), "fused != XLA selection"
    print(f"[2] fused == XLA selection OK ({time.monotonic()-t0:.0f}s)")

    # 3. packed storage == dense end-to-end, and self-match correctness
    packed = PlaintextEngine(dpat, dmsk, chunk=2048, storage="packed")
    rd = dense.match(qpat, qmsk)
    rp = packed.match(qpat, qmsk)
    for want, a, c in zip(idx, rd, rp):
        assert (a.index, a.distance) == (c.index, c.distance), "packed != dense"
        assert a.index == want and a.distance == 0.0, "self-match failed"
    print(f"[3] packed == dense, self-match exact OK ({time.monotonic()-t0:.0f}s)")

    # 4. share + masks engines reconstruct one exact distance
    from mpc_iris_tpu.ops.encode import encode_template
    from mpc_iris_tpu.types import Bits, Template
    from mpc_iris_tpu.ops.decode import decode_distance

    db_t = [Template(Bits(p), Bits(m)) for p, m in zip(dpat[:64], dmsk[:64])]
    mats = [np.zeros((64, 12800), np.uint16) for _ in range(2)]
    for i, t in enumerate(db_t):
        for pi, sh in enumerate(encode_template(t).share(2, rng)):
            mats[pi][i] = sh.data
    se = [ShareEngine(m, chunk=64) for m in mats]
    me = MasksEngine(dmsk[:64], chunk=64)
    dots = sum(e.dots(qpat[:1], qmsk[:1]).astype(np.uint16) for e in se)
    dens = me.dots(qmsk[:1])
    d_mpc = decode_distance(dots[0, 7], dens[0, 7])
    d_ref = Template(Bits(qpat[0]), Bits(qmsk[0])).distance(db_t[7])
    assert d_mpc == d_ref, (d_mpc, d_ref)
    print(f"[4] 2-party reconstruction == scalar oracle OK "
          f"({time.monotonic()-t0:.0f}s)")

    # 5. keyed path: the Mosaic ChaCha word generator == the XLA emitter on
    # device, including a row0 near 2^32 (u64-nonce carry at a tile base —
    # the CPU suite only exercises this kernel in interpret mode), and a
    # KeyedShareEngine's dots == a ShareEngine fed the regenerated rows.
    import jax.numpy as jnp

    from mpc_iris_tpu import native
    from mpc_iris_tpu.models.engines import KeyedShareEngine
    from mpc_iris_tpu.ops import chacha

    key = native.derive_insecure_key(12345)
    kw = jnp.asarray(chacha.key_words(key))
    for row0 in (np.uint32(0), np.uint32(0xFFFFFFC0)):
        ref = chacha.share_planes_natural(kw, np.uint32(3), row0, 256)
        pal = chacha.share_planes_natural_pallas(kw, np.uint32(3), row0, 256,
                                                 tile_r=128)
        for a, c in zip(ref, pal):
            assert np.array_equal(np.asarray(a), np.asarray(c)), (
                f"Mosaic ChaCha != XLA at row0={int(row0):#x}")
    keyed = KeyedShareEngine(key, 0, count=256, chunk=128)
    rows = np.asarray(chacha.share_rows(kw, np.uint32(0), np.uint32(0), 256))
    file_eng = ShareEngine(rows, chunk=128)
    assert np.array_equal(keyed.dots(qpat[:2], qmsk[:2]),
                          file_eng.dots(qpat[:2], qmsk[:2])), "keyed != file"
    print(f"[5] Mosaic ChaCha == XLA (incl. nonce wrap); keyed == file "
          f"engine OK ({time.monotonic()-t0:.0f}s)")

    # 6. serving stack on the live chip: 2-party coordinator behind a
    # QueryServer, one-shot AND persistent wires (SPEC 5.2/5.5), outcomes
    # equal the scalar-oracle distance from [4]'s world.
    import asyncio

    from mpc_iris_tpu.protocol import (
        Coordinator,
        ParticipantServer,
        PersistentQueryClient,
        QueryServer,
        query_remote,
    )

    q_t = Template(Bits(qpat[0]), Bits(qmsk[0]))
    oracle = np.array([q_t.distance(t) for t in db_t])

    async def serve_round():
        parts = [ParticipantServer(e, "127.0.0.1", 0) for e in se]
        addrs = [await p.start() for p in parts]
        coord = Coordinator(me, addrs, batch_records=32)
        front = QueryServer(coord, "127.0.0.1", 0)
        host, port = await front.start()
        try:
            solo = await query_remote(host, port, q_t)
            client = await PersistentQueryClient.connect(host, port)
            p1 = await client.query(q_t)
            p2 = await client.query(db_t[7])
            await client.close()
            return solo, p1, p2
        finally:
            await front.close()
            for p in parts:
                await p.close()

    solo, p1, p2 = asyncio.run(serve_round())
    assert (solo.index, solo.distance) == (p1.index, p1.distance)
    assert solo.index == int(np.argmin(oracle))
    assert solo.distance == oracle.min()
    assert p2.index == 7 and p2.distance == 0.0  # DB self-match
    print(f"[6] serving front (one-shot + persistent wires) == oracle OK "
          f"({time.monotonic()-t0:.0f}s)")
    print("TPU smoke: ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
