"""Sharded match engines: the single-chip engines of models/engines.py distributed
over a `jax.sharding.Mesh` with explicit `shard_map` SPMD.

Data distribution (strided-by-chunk):

The padded DB of G = C_local * D chunks (chunk = c entries) is laid out as a global
array [C_local, D, c, K] whose second axis shards over the ``"db"`` mesh axis, so
device i holds the global chunks {j*D + i}. Consequences:

- global entry index of (local chunk j, device i, position p) = (j*D + i)*c + p,
- one sharded "block step" at local chunk j computes the D *consecutive* global
  chunks j*D .. j*D+D-1 in parallel, so protocol reply streams come out in DB order
  (reference wire order, src/main.rs:428-434) while every device stays busy.

Queries shard over ``"batch"``; the global match winner is combined with
`fraction_allmin` over ``"db"`` (exact integer fractions over ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from mpc_iris_tpu.models.engines import (
    DEFAULT_CHUNK,
    _mask_dots_chunk,
    _results_from_triples,
    _share_dots_chunk,
    match_scan_auto,
    prepare_query_planes,
)
from mpc_iris_tpu.models.engines import _fused_ok as _fused_ok_local
from mpc_iris_tpu.ops.dot import shares_to_planes
from mpc_iris_tpu.ops.encode import encode_grid_i8, unpack_bits
from mpc_iris_tpu.parallel.collectives import fraction_allmin


def _blocked(arr: np.ndarray, chunk: int, n_shards: int):
    """Host: [N, ...] -> ([C_local, D, chunk, ...], true_count) with zero padding."""
    n = arr.shape[0]
    block = chunk * n_shards
    g_blocks = max(1, -(-n // block))
    padded = g_blocks * block
    if padded != n:
        pad = [(0, padded - n)] + [(0, 0)] * (arr.ndim - 1)
        arr = np.pad(arr, pad, constant_values=0)
    return arr.reshape(g_blocks, n_shards, chunk, *arr.shape[1:]), n


class _ShardedBase:
    def __init__(self, mesh, chunk: int):
        self.mesh = mesh
        self.n_shards = mesh.shape["db"]
        self.chunk = chunk
        self.db_sharding = NamedSharding(mesh, P(None, "db", None, None))

    def _put_db(self, arr: np.ndarray):
        return jax.device_put(arr, self.db_sharding)

    def _query_sharding(self):
        return NamedSharding(self.mesh, P("batch", None, None))


class ShardedPlaintextEngine(_ShardedBase):
    """Fused plaintext min-distance search over a DB sharded across chips."""

    def __init__(self, patterns_packed, masks_packed, mesh,
                 chunk: int = DEFAULT_CHUNK, storage: str = "auto"):
        """storage: as in models.PlaintextEngine — "packed" keeps raw bit planes
        per shard (3.2 KB/entry) and unpacks per chunk on device; "auto" picks
        packed past 400k entries *per shard*."""
        n = patterns_packed.shape[0]
        chunk = min(chunk, max(128, -(-n // mesh.shape["db"])))
        super().__init__(mesh, chunk)
        if storage == "auto":
            storage = "packed" if n // mesh.shape["db"] > 400_000 else "dense"
        self.storage = storage
        if storage == "packed":
            pat_b, self.count = _blocked(
                np.ascontiguousarray(patterns_packed, dtype=np.uint8),
                chunk, self.n_shards,
            )
            msk_b, _ = _blocked(
                np.ascontiguousarray(masks_packed, dtype=np.uint8),
                chunk, self.n_shards,
            )
            self.db_enc = self._put_db(pat_b)  # packed pattern planes
            self.db_mask = self._put_db(msk_b)  # packed mask planes
        else:
            p = unpack_bits(np.asarray(patterns_packed), xp=np).astype(np.int8)
            m = unpack_bits(np.asarray(masks_packed), xp=np).astype(np.int8)
            enc = encode_grid_i8(p, m, xp=np)
            enc_b, self.count = _blocked(enc, chunk, self.n_shards)
            mask_b, _ = _blocked(m, chunk, self.n_shards)
            self.db_enc = self._put_db(enc_b)
            self.db_mask = self._put_db(mask_b)

        c, d = self.chunk, self.n_shards
        packed = storage == "packed"

        def spmd(q_enc, q_mask, db_a, db_b):
            # local: q [B_local, 31, K]; db [C_local, 1, c, K or K/8]
            local_a = db_a.reshape(db_a.shape[0], c, db_a.shape[-1])
            local_b = db_b.reshape(db_b.shape[0], c, db_b.shape[-1])
            if packed:
                from mpc_iris_tpu.models.engines import _match_scan_packed

                fused = _fused_ok_local(q_enc.shape[0], c)
                n_, d_, l = _match_scan_packed(
                    q_enc, q_mask, local_a, local_b,
                    interpret=fused and jax.default_backend() != "tpu",
                    fused=fused,
                )
            else:
                # Fused Pallas selection when local shapes align (TPU), else XLA.
                n_, d_, l = match_scan_auto(q_enc, q_mask, local_a, local_b)
            # local l = j*c + p  ->  global (j*D + i)*c + p
            i_rank = lax.axis_index("db").astype(jnp.int32)
            g = (l // c) * (d * c) + i_rank * c + (l % c)
            return fraction_allmin(n_, d_, g, "db")

        self._match = jax.jit(
            shard_map(
                spmd,
                mesh=self.mesh,
                in_specs=(P("batch", None, None), P("batch", None, None),
                          P(None, "db", None, None), P(None, "db", None, None)),
                out_specs=(P("batch"), P("batch"), P("batch")),
                check_vma=False,
            )
        )

    def match_arrays(self, q_enc, q_mask):
        return self._match(q_enc, q_mask, self.db_enc, self.db_mask)

    def match(self, patterns_packed, masks_packed):
        q_enc, q_mask = prepare_query_planes(
            jnp.asarray(patterns_packed), jnp.asarray(masks_packed)
        )
        q_enc = jax.device_put(q_enc, self._query_sharding())
        q_mask = jax.device_put(q_mask, self._query_sharding())
        n, d, i = self.match_arrays(q_enc, q_mask)
        return _results_from_triples(n, d, i)


class ShardedShareEngine(_ShardedBase):
    """Participant dot-share engine over a share DB sharded across chips."""

    def __init__(self, shares_u16, mesh, chunk: int = DEFAULT_CHUNK):
        """shares_u16: uint16 [N, 12800] (host, e.g. np.memmap).

        Loading is out-of-core on the host side: raw u16 rows are `device_put`
        one *block* (= one chunk per shard) at a time directly onto the
        sharded mesh and byte-split into int8 lo/hi planes on device — the
        host never materializes converted planes (peak host RAM = one block;
        the reference mmaps its share file the same way, src/main.rs:386-400).
        Device HBM must hold the full shard (25.6 KB/entry/shard); for a DB
        past the mesh's combined HBM use the single-chip ShareEngine's
        streamed mode per party or a bigger mesh."""
        n = shares_u16.shape[0]
        chunk = min(chunk, max(128, -(-n // mesh.shape["db"])))
        super().__init__(mesh, chunk)
        n, k = shares_u16.shape
        d = self.n_shards
        block = chunk * d
        g_blocks = max(1, -(-n // block))
        self.count = n
        u16_sharding = NamedSharding(mesh, P("db", None, None))
        planes_sharding = NamedSharding(mesh, P("db", None, None, None))
        reformat = jax.jit(
            lambda s: jnp.stack(shares_to_planes(s), axis=1),
            out_shardings=planes_sharding,
        )
        self._blocks = []  # per block: int8 [D, 2, chunk, K], sharded on "db"
        for j in range(g_blocks):
            start = j * block
            end = min(n, start + block)
            rows = np.ascontiguousarray(shares_u16[start:end], dtype=np.uint16)
            if end - start < block:
                rows = np.pad(rows, [(0, block - (end - start)), (0, 0)])
            dev = jax.device_put(rows.reshape(d, chunk, k), u16_sharding)
            self._blocks.append(reformat(dev))

        def spmd(q_enc, planes_j):
            # local: planes_j [1, 2, c, K] -> [B, c, 31]
            return _share_dots_chunk(q_enc, planes_j[0, 0], planes_j[0, 1])

        self._block = jax.jit(
            shard_map(
                spmd,
                mesh=self.mesh,
                in_specs=(P(None, None, None), P("db", None, None, None)),
                out_specs=P(None, "db", None),
                check_vma=False,
            ),
        )

    def num_blocks(self) -> int:
        return len(self._blocks)

    def block(self, q_enc, j: int):
        """Global chunks j*D .. j*D+D-1: uint16 [B, D*chunk, 31] in DB order."""
        return self._block(q_enc, self._blocks[j])

    def stream(self, patterns_packed, masks_packed, entry_major: bool = False):
        """Yield host uint16 blocks in DB order, trimmed ([B, n, 31] or
        entry-major [n, B, 31])."""
        from mpc_iris_tpu.models.engines import _to_entry_major, pipelined_stream

        q_enc, _ = prepare_query_planes(
            jnp.asarray(patterns_packed), jnp.asarray(masks_packed)
        )
        if entry_major:
            dispatch = lambda j: _to_entry_major(self.block(q_enc, j))
        else:
            dispatch = lambda j: self.block(q_enc, j)
        yield from pipelined_stream(
            dispatch, self.num_blocks(), self.count, self.chunk * self.n_shards,
            entry_axis=0 if entry_major else 1,
        )

    def dots(self, patterns_packed, masks_packed) -> np.ndarray:
        return np.concatenate(list(self.stream(patterns_packed, masks_packed)), axis=1)


class ShardedMasksEngine(_ShardedBase):
    """Coordinator denominator engine over a masks DB sharded across chips."""

    def __init__(self, masks_packed, mesh, chunk: int = DEFAULT_CHUNK,
                 storage: str = "auto"):
        n = masks_packed.shape[0]
        chunk = min(chunk, max(128, -(-n // mesh.shape["db"])))
        super().__init__(mesh, chunk)
        if storage == "auto":
            storage = "packed" if n // mesh.shape["db"] > 400_000 else "dense"
        self.storage = storage
        if storage == "packed":
            mask_b, self.count = _blocked(
                np.ascontiguousarray(masks_packed, dtype=np.uint8),
                chunk, self.n_shards,
            )
        else:
            m = unpack_bits(np.asarray(masks_packed), xp=np).astype(np.int8)
            mask_b, self.count = _blocked(m, chunk, self.n_shards)
        self.db_mask = self._put_db(mask_b)
        packed = storage == "packed"

        def spmd(q_mask, mask_j):
            if packed:
                from mpc_iris_tpu.models.engines import _mask_dots_chunk_packed

                return _mask_dots_chunk_packed(q_mask, mask_j[0])
            return _mask_dots_chunk(q_mask, mask_j[0])

        self._block = jax.jit(
            shard_map(
                spmd,
                mesh=self.mesh,
                in_specs=(P(None, None, None), P("db", None, None)),
                out_specs=P(None, "db", None),
                check_vma=False,
            ),
        )

    def num_blocks(self) -> int:
        return self.db_mask.shape[0]

    def stream(self, masks_packed, entry_major: bool = False):
        from mpc_iris_tpu.models.engines import _to_entry_major, pipelined_stream

        q = jnp.asarray(masks_packed)
        _, q_mask = prepare_query_planes(jnp.zeros_like(q), q)
        if entry_major:
            dispatch = lambda j: _to_entry_major(self._block(q_mask, self.db_mask[j]))
        else:
            dispatch = lambda j: self._block(q_mask, self.db_mask[j])
        yield from pipelined_stream(
            dispatch, self.num_blocks(), self.count, self.chunk * self.n_shards,
            entry_axis=0 if entry_major else 1,
        )

    def dots(self, masks_packed) -> np.ndarray:
        return np.concatenate(list(self.stream(masks_packed)), axis=1)
