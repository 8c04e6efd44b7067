"""Batched dot-product kernels — the reference's `arch::dot_bool` / `arch::dot_u16`
(src/arch/generic.rs:4-16, src/arch/sve.rs:27-77) reformulated as int8 MXU matmuls.

Shapes follow the matmul view of the match problem (SURVEY.md section 7):

    D[M, N] = Q[M, K] @ DB[N, K]^T,   K = 12,800

where M = batch x 31 rotations of the query side and N = DB entries.

Exact Z_2^16 on the MXU
-----------------------
The MXU multiplies int8 x int8 into int32. The share DB is u16, but the *query* side is
always the ternary encoding q in {-1, 0, 1} (reference src/lib.rs:16-26), so a u16
share s = s_lo + 256*s_hi (s_lo, s_hi in [0, 255]) gives

    sum_k q*s  =  (Q @ S_lo^T)  +  256 * (Q @ S_hi^T)        (exact in int32)

To fit the unsigned byte planes into int8 we store them offset by -128 and correct with
a rank-1 term: Q @ S_lo^T = Q @ (S_lo - 128)^T + 128 * rowsum(Q), where rowsum(Q) is a
per-LHS-row scalar. All magnitudes stay < 2^30, so int32 accumulation over K = 12,800
is exact; the final result is reduced mod 2^16 — bit-identical to the reference's
wrapping-u16 accumulation (verified against the scalar oracle, mirroring the
reference's SVE-vs-generic kernel test src/arch/sve.rs:79-109).

This costs 2 int8 matmuls per share dot — vs 1 for the plaintext/denominator paths —
and is the only exact formulation that keeps the DB operand in int8.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DOT_DIMS = (((1,), (1,)), ((), ()))  # contract K against K, no batch dims


def _matmul_i8(q, db):
    """int8 [M, K] x int8 [N, K] -> int32 [M, N] on the MXU."""
    return lax.dot_general(q, db, dimension_numbers=_DOT_DIMS, preferred_element_type=jnp.int32)


def dot_bits_batch(q, db):
    """Batched `dot_bool`-family kernel: int8 Q [M, K] x int8 DB [N, K] -> int32 [M, N].

    With {0,1} operands this is AND-popcount (reference dot_bool,
    src/arch/generic.rs:4-9); with {-1,0,1} operands it is the plaintext encoded dot
    (#equal - #unequal over jointly masked bits). Exact in int32 (|sum| <= 12,800).
    """
    return _matmul_i8(q, db)


def dot_bits_batch_i4(q, db, out_dtype=jnp.int32):
    """`dot_bits_batch` on the int4 MXU path — ~1.7x the int8 rate on TPU v5e.

    Operand values must fit int4 (they do: {-1,0,1} encodings and {0,1} masks).
    The conversion happens inline per chunk so the HBM-resident DB stays int8
    (int4-materialized HBM arrays measured *slower* to stream); XLA fuses the
    cast into the matmul's VMEM pipeline. Non-TPU backends (tests, virtual CPU
    meshes) fall back to int8 — the CPU backend rejects some int4 dot shapes.

    ``out_dtype=int16`` halves the output's HBM traffic and is still exact:
    |dot| <= 12,800 < 2^15, and every K-prefix partial sum of +-1 products is
    bounded by the number of terms, so even int16 accumulation cannot wrap.
    """
    import jax

    if jax.default_backend() != "tpu":
        out = _matmul_i8(q, db)
        return out.astype(out_dtype) if out_dtype != jnp.int32 else out
    return lax.dot_general(
        q.astype(jnp.int4),
        db.astype(jnp.int4),
        dimension_numbers=_DOT_DIMS,
        preferred_element_type=out_dtype,
    )


def shares_to_planes(shares_u16):
    """u16 share matrix [N, K] -> (lo, hi) int8 planes [N, K], offset by -128.

    lo = (s & 255) - 128, hi = (s >> 8) - 128, both in [-128, 127].
    """
    s = jnp.asarray(shares_u16)
    if s.dtype != jnp.uint16:
        s = s.astype(jnp.uint16)
    lo = (s & jnp.uint16(0xFF)).astype(jnp.int32) - 128
    hi = (s >> jnp.uint16(8)).astype(jnp.int32) - 128
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def planes_to_shares(lo, hi):
    """Inverse of :func:`shares_to_planes` (for tests / decrypt)."""
    lo_u = (lo.astype(jnp.int32) + 128).astype(jnp.uint16)
    hi_u = (hi.astype(jnp.int32) + 128).astype(jnp.uint16)
    return (lo_u | (hi_u << jnp.uint16(8))).astype(jnp.uint16)


def dot_share_batch(q_i8, db_lo, db_hi):
    """Exact wrapping-u16 dot of ternary queries against a u16 share DB.

    Args:
      q_i8:   int8 [M, K] with values in {-1, 0, 1} (rotated encoded queries).
      db_lo:  int8 [N, K] low-byte plane, offset -128 (see :func:`shares_to_planes`).
      db_hi:  int8 [N, K] high-byte plane, offset -128.

    Returns:
      uint16 [M, N], bit-identical to the reference's `arch::dot_u16`
      (src/arch/generic.rs:11-16) applied pairwise.

    On TPU the whole pipeline runs in wrapping int16: the result is only needed
    mod 2^16 and two's-complement truncation/overflow IS reduction mod 2^16
    (ring homomorphism), so int16 matmul outputs halve the HBM traffic with
    bit-identical results (verified vs the int32 pipeline and the scalar
    oracle, including extreme share values).
    """
    import jax

    q_i8 = q_i8.astype(jnp.int8)
    if jax.default_backend() == "tpu":
        d_lo = lax.dot_general(q_i8, db_lo, dimension_numbers=_DOT_DIMS,
                               preferred_element_type=jnp.int16)
        d_hi = lax.dot_general(q_i8, db_hi, dimension_numbers=_DOT_DIMS,
                               preferred_element_type=jnp.int16)
        rowsum = jnp.sum(q_i8.astype(jnp.int32), axis=1, keepdims=True)
        corr = (jnp.int32(128) * rowsum).astype(jnp.int16)
        total = (d_lo + corr) + ((d_hi + corr) << 8)
        return total.astype(jnp.uint16)
    d_lo = _matmul_i8(q_i8, db_lo)  # Q @ (S_lo - 128)^T
    d_hi = _matmul_i8(q_i8, db_hi)  # Q @ (S_hi - 128)^T
    # Rank-1 offset correction: +128 * rowsum(Q) for each plane.
    rowsum = jnp.sum(q_i8.astype(jnp.int32), axis=1, keepdims=True)  # [M, 1]
    corr = 128 * rowsum
    total = (d_lo + corr) + ((d_hi + corr) << 8)
    return (total & jnp.int32(0xFFFF)).astype(jnp.uint16)


def dot_u16_oracle(a, b):
    """Scalar NumPy oracle for wrapping-u16 dot (for parity tests)."""
    import numpy as np

    prod = np.asarray(a, dtype=np.int64) * np.asarray(b, dtype=np.int64)
    return np.uint16(np.sum(prod) & 0xFFFF)


_self_test_done = False


def kernel_self_test():
    """One-time runtime canary: fast MXU paths == NumPy oracles on this backend.

    The int16/int4 fast paths rely on backend behaviors that are verified
    empirically (wrapping integer downcasts, int4 dot support); a backend or
    compiler change that broke them would corrupt results silently. This runs
    once per process (engines call it lazily) and raises on any mismatch —
    the runtime analogue of the reference's asm-vs-generic kernel test
    (src/arch/sve.rs:79-109). Costs one tiny dispatch.
    """
    global _self_test_done
    if _self_test_done:
        return
    import numpy as np

    import jax

    rng = np.random.default_rng(0xC0DE)
    k = 12800
    q = rng.integers(-1, 2, size=(4, k)).astype(np.int8)
    # Extreme + random share rows.
    s = rng.integers(0, 1 << 16, size=(4, k)).astype(np.uint16)
    s[0, :] = 0xFFFF
    s[1, :] = 0x8000
    s[2, :2] = [0, 0xFFFF]
    m = rng.integers(0, 2, size=(4, k)).astype(np.int8)

    # Everything under ONE jit: eager int4 intermediates cannot cross some
    # remote-transfer boundaries (and a single dispatch is cheaper anyway).
    @jax.jit
    def run(q, s, m):
        lo, hi = shares_to_planes(s)
        return jnp.stack([
            dot_share_batch(q, lo, hi).astype(jnp.int32),
            dot_bits_batch_i4(q, m),
            dot_bits_batch_i4(q, m, out_dtype=jnp.int16).astype(jnp.int32),
        ])

    got, got_mask, got_mask16 = np.asarray(run(q, s, m))
    for i in range(4):
        for j in range(4):
            want = int(dot_u16_oracle(q[i], s[j]))
            if int(got[i, j]) != want:
                raise RuntimeError(
                    f"share-dot kernel self-test FAILED at [{i},{j}]: "
                    f"{int(got[i, j])} != {want} — backend integer semantics "
                    "changed; results would be corrupt"
                )
            want_m = int((q[i].astype(np.int64) * m[j]).sum())
            if int(got_mask[i, j]) != want_m or int(got_mask16[i, j]) != want_m:
                raise RuntimeError(
                    f"mask-dot kernel self-test FAILED at [{i},{j}]"
                )
    _self_test_done = True
