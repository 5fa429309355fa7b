"""Fused group-dequant matmul Pallas kernel.

TPU-native replacement for the reference weight-only GEMM/GEMV kernels
(reference: cpp/tensorrt_llm/kernels/weightOnlyBatchedGemv/kernel.h:31-60
for small M; cutlass_kernels/fpA_intB_gemm/ for large M). Decode-phase
matmuls are HBM-bandwidth bound on weight reads, so the win is reading
weights at the quantized footprint (int4 = 4x less traffic than bf16) and
dequantizing in VMEM on the way to the MXU.

Layout decisions (differ deliberately from the CUDA interleaved layout —
the TPU constraint is (sublane, lane) tiling, not ldmatrix):

  * int4 weights are packed two-per-byte along K **split halves**:
    packed[i, n] holds q[i, n] in the low nibble and q[i + K//2, n] in the
    high nibble. Unpacking is then two arithmetic shifts — no cross-sublane
    interleave (which Mosaic would turn into a relayout).
  * The K-tile equals the quant group size, so each partial product
    x_tile @ w_tile is scaled by a single scales row applied to the
    [M, TILE_N] result — O(M*N) multiplies instead of O(K*N).
  * x stays whole in VMEM (decode M is small); w is streamed tile by tile.

For large-M prefill the XLA dequant path (ops/linear.py) is used instead;
the wrapper auto-falls back above ``M_PALLAS_MAX``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_PALLAS_MAX = 128
TILE_N = 256


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 values [K, N] (int8 storage, range [-8, 7]) into
    [K//2, N] int8: low nibble = rows [0, K/2), high nibble = rows [K/2, K)."""
    K = q.shape[0]
    assert K % 2 == 0
    lo = q[:K // 2].astype(jnp.int8) & 0x0F
    hi = q[K // 2:].astype(jnp.int8) & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4 → [K, N] int8 in [-8, 7]."""
    lo = (packed << 4).astype(jnp.int8) >> 4
    hi = packed >> 4
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _w4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group_size, k_half):
    """Grid (nj, nk): j over N tiles, k over packed-K tiles (inner)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kp0 = k * group_size
    w8 = w_ref[:].astype(jnp.int32)                  # [G, TILE_N] packed
    # nibble unpack in i32 (Mosaic has no i8 vector shifts):
    # low nibble sign-extended via <<28 >>28; high via arithmetic >>4
    lo = ((w8 << 28) >> 28).astype(jnp.bfloat16)
    hi = (w8 >> 4).astype(jnp.bfloat16)
    x_lo = x_ref[:, pl.ds(kp0, group_size)]
    x_hi = x_ref[:, pl.ds(kp0 + k_half, group_size)]
    p_lo = jnp.dot(x_lo, lo, preferred_element_type=jnp.float32)
    p_hi = jnp.dot(x_hi, hi, preferred_element_type=jnp.float32)
    s_lo = s_ref[k, :]                               # [TILE_N]
    s_hi = s_ref[k + nk, :]
    acc_ref[:] += p_lo * s_lo[None, :] + p_hi * s_hi[None, :]

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group_size):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)                # [G, TILE_N]
    x_k = x_ref[:, pl.ds(k * group_size, group_size)]
    p = jnp.dot(x_k, w, preferred_element_type=jnp.float32)
    acc_ref[:] += p * s_ref[k, :][None, :]

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("group_size", "bits", "interpret"))
def groupwise_dequant_matmul(x: jax.Array,        # [M, K] bf16/f32
                             w: jax.Array,        # int4: [K//2, N] packed int8
                                                  # int8: [K, N] int8
                             scales: jax.Array,   # [K//group_size, N] f32
                             *, group_size: int = 128,
                             bits: int = 4,
                             interpret: bool = False) -> jax.Array:
    M, K = x.shape
    N = w.shape[1]
    num_groups = scales.shape[0]
    assert num_groups * group_size == K

    if M > M_PALLAS_MAX:
        # prefill shapes: XLA dequant path is compute-bound anyway
        from ..quant import dequantize_weight
        wq = unpack_int4(w) if bits == 4 else w
        wd = dequantize_weight(wq, scales, group_size=group_size, dtype=x.dtype)
        return jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(x.dtype)

    m_pad = _round_up(max(M, 16), 16)
    n_pad = _round_up(N, TILE_N)
    if m_pad != M:
        x = jnp.pad(x, ((0, m_pad - M), (0, 0)))
    if n_pad != N:
        w = jnp.pad(w, ((0, 0), (0, n_pad - N)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - N)))
    x = x.astype(jnp.bfloat16)
    scales = scales.astype(jnp.float32)

    nj = n_pad // TILE_N
    if bits == 4:
        assert K % (2 * group_size) == 0, "K/2 must be a multiple of group_size"
        k_half = K // 2
        nk = k_half // group_size
        kernel = functools.partial(_w4_kernel, group_size=group_size,
                                   k_half=k_half)
        w_spec = pl.BlockSpec((group_size, TILE_N), lambda j, k: (k, j))
    else:
        nk = num_groups
        kernel = functools.partial(_w8_kernel, group_size=group_size)
        w_spec = pl.BlockSpec((group_size, TILE_N), lambda j, k: (k, j))

    out = pl.pallas_call(
        kernel,
        grid=(nj, nk),
        in_specs=[
            pl.BlockSpec((m_pad, K), lambda j, k: (0, 0)),       # x whole
            w_spec,                                               # w tile
            pl.BlockSpec((num_groups, TILE_N), lambda j, k: (0, j)),  # scales
        ],
        out_specs=pl.BlockSpec((m_pad, TILE_N), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, TILE_N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * K * n_pad,
            bytes_accessed=(K * n_pad * bits) // 8 + m_pad * K * 2
            + m_pad * n_pad * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w, scales)
    return out[:M, :N]
