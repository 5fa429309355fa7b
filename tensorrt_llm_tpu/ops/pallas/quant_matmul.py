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


# --------------------------------------------------------------------- #
# GSPMD-partitionable wrappers (custom_partitioning)
#
# A pallas_call is a black box to the SPMD partitioner: under a mesh
# XLA would all-gather every operand. custom_partitioning teaches the
# partitioner how this op shards (the role TP-aware kernel dispatch
# plays in the reference, kernels/weightOnlyBatchedGemv/kernel.h:31 —
# each rank runs the kernel on its local shard):
#   * column-parallel (w sharded on N): every shard runs the kernel on
#     its N-slice; scales follow N; no collective.
#   * row-parallel (w sharded on packed-K): x arrives as [M, 2, K/2]
#     so a contiguous shard of its LAST dim is exactly the (lo, hi)
#     nibble halves of the local packed rows; partial products psum
#     over the K axes.
# The int4 split-halves pack layout (pack_int4) is what makes the
# row-parallel case need the 3-d x view: packed row i holds original
# rows i and i + K/2, so a flat contiguous K-shard would not line up.
# --------------------------------------------------------------------- #
from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as _P  # noqa: E402


def _axes(entry):
    """Normalize a PartitionSpec entry to a tuple of axis names."""
    if entry is None:
        return ()
    if isinstance(entry, (tuple, list)):
        return tuple(a for a in entry if a is not None)
    return (entry,)


def _spec_entry(spec, i):
    return spec[i] if spec is not None and len(spec) > i else None


def _make_partition(n_x_dims):
    """Build (infer, partition) callbacks shared by the int4/int8 ops.

    n_x_dims = 3 (int4: x [M, 2, K/2], scales [2, K/(2G), N]) or
    2 (int8: x [M, K], scales [K/G, N]). The weight is always 2-d
    [packedK, N] and is the sharding authority: its dim-0 axes shard the
    contraction (psum), its dim-1 axes shard the output columns."""

    def _w_axes(arg_shapes):
        wspec = arg_shapes[1].sharding.spec
        return _axes(_spec_entry(wspec, 0)), _axes(_spec_entry(wspec, 1))

    def infer(group_size, interpret, mesh, arg_shapes, result_shape):
        kax, nax = _w_axes(arg_shapes)
        xspec = arg_shapes[0].sharding.spec
        max_ = _axes(_spec_entry(xspec, 0))
        return NamedSharding(mesh, _P(max_ or None, nax or None))

    def partition(group_size, interpret, mesh, arg_shapes, result_shape):
        kax, nax = _w_axes(arg_shapes)
        xspec = arg_shapes[0].sharding.spec
        max_ = _axes(_spec_entry(xspec, 0)) or None
        kspec = tuple(kax) or None
        nspec = tuple(nax) or None
        if n_x_dims == 3:
            arg_shardings = (
                NamedSharding(mesh, _P(max_, None, kspec)),
                NamedSharding(mesh, _P(kspec, nspec)),
                NamedSharding(mesh, _P(None, kspec, nspec)),
            )
        else:
            arg_shardings = (
                NamedSharding(mesh, _P(max_, kspec)),
                NamedSharding(mesh, _P(kspec, nspec)),
                NamedSharding(mesh, _P(kspec, nspec)),
            )
        out_sharding = NamedSharding(mesh, _P(max_, nspec))

        def lower_fn(x, w, s):
            xl = x.reshape(x.shape[0], -1)
            sl = s.reshape(-1, s.shape[-1])
            out = groupwise_dequant_matmul(
                xl, w, sl, group_size=group_size,
                bits=4 if n_x_dims == 3 else 8, interpret=interpret)
            if kax:
                out = jax.lax.psum(out, tuple(kax))
            return out

        return mesh, lower_fn, out_sharding, arg_shardings

    return infer, partition


@functools.partial(custom_partitioning, static_argnums=(3, 4))
def _gdm4_op(x3, w, s3, group_size, interpret):
    return groupwise_dequant_matmul(
        x3.reshape(x3.shape[0], -1), w, s3.reshape(-1, s3.shape[-1]),
        group_size=group_size, bits=4, interpret=interpret)


def _rule4(group_size, interpret, mesh, value_types, result_types):
    # x3 [m, h, (g k)], w [(g k), n], s3 [h2, g2, n2] -> [m, n].
    # g is the shardable super-factor of the contraction (whole quant
    # groups); k = group_size stays intact within a shard; the h=2
    # split-halves dim and the scales' group dim must not be split on
    # their own (the partition callback co-shards them with w).
    from jax._src.lib.mlir import ir
    kp = ir.RankedTensorType(value_types[1]).shape[0]   # packed K = K/2
    return ("m h (g k), (g k) n, h2 g2 n2 -> m n",
            dict(reduction_factors=("g", "k"),
                 need_replication_factors=("h", "h2", "g2"),
                 g=kp // group_size, k=group_size))


_infer4, _part4 = _make_partition(3)
_gdm4_op.def_partition(
    partition=_part4, infer_sharding_from_operands=_infer4,
    sharding_rule=_rule4,
)


@functools.partial(custom_partitioning, static_argnums=(3, 4))
def _gdm8_op(x, w, s, group_size, interpret):
    return groupwise_dequant_matmul(x, w, s, group_size=group_size,
                                    bits=8, interpret=interpret)


def _rule8(group_size, interpret, mesh, value_types, result_types):
    from jax._src.lib.mlir import ir
    K = ir.RankedTensorType(value_types[1]).shape[0]
    return ("m (g k), (g k) n, g2 n2 -> m n",
            dict(reduction_factors=("g", "k"),
                 need_replication_factors=("g2",),
                 g=K // group_size, k=group_size))


_infer8, _part8 = _make_partition(2)
_gdm8_op.def_partition(
    partition=_part8, infer_sharding_from_operands=_infer8,
    sharding_rule=_rule8,
)


def groupwise_dequant_matmul_sharded(x, w, scales, *, group_size=128,
                                     bits=4, interpret=False):
    """GSPMD-partitionable fused dequant matmul.

    Same contract as groupwise_dequant_matmul but safe to call inside a
    jitted program running under any mesh: the partitioner receives a
    sharding rule instead of gathering the operands. Dynamic rule-sizing
    constraint: each shard's K must stay a whole number of quant groups
    (K/(2·tp) % group_size == 0 for int4) — the partition callback's
    local kernel asserts this at trace time."""
    M, K = x.shape
    if bits == 4:
        x3 = x.reshape(M, 2, K // 2)
        s3 = scales.reshape(2, scales.shape[0] // 2, scales.shape[1])
        return _gdm4_op(x3, w, s3, group_size, interpret)
    return _gdm8_op(x, w, scales, group_size, interpret)
