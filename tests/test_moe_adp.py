"""Attention-DP MoE dispatch (ops/moe.py moe_mlp_adp): tokens sharded
over dp, experts sharded over the same devices (reference DEPn layout,
moeAlltoAllKernels.cu role), all-to-all dispatch + mirrored combine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensorrt_llm_tpu.ops.moe import (moe_mlp_adp, moe_mlp_ragged,
                                      topk_routing)


def make_mesh(n=4):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(jax.devices()[:n]), ("dp",))


def rand_moe(E=8, H=32, I=48, T=24, k=2, seed=0):
    r = np.random.default_rng(seed)
    w_gate = jnp.asarray(r.standard_normal((E, H, I), np.float32) * 0.1)
    w_up = jnp.asarray(r.standard_normal((E, H, I), np.float32) * 0.1)
    w_down = jnp.asarray(r.standard_normal((E, I, H), np.float32) * 0.1)
    router = jnp.asarray(r.standard_normal((H, E), np.float32) * 0.5)
    x = jnp.asarray(r.standard_normal((T, H), np.float32))
    logits = jnp.dot(x, router)
    probs, idx = topk_routing(logits, k)
    return x, w_gate, w_up, w_down, probs, idx


def test_adp_matches_single_device():
    mesh = make_mesh(4)
    x, wg, wu, wd, probs, idx = rand_moe()
    ref = moe_mlp_ragged(x, wg, wu, wd, probs, idx)
    got = moe_mlp_adp(x, wg, wu, wd, probs, idx, mesh, dp_axis="dp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_adp_sharded_inputs_jit():
    """Under jit with dp-sharded operands (the serving layout): same
    numbers, and the output keeps the dp sharding."""
    mesh = make_mesh(4)
    x, wg, wu, wd, probs, idx = rand_moe(T=32, seed=1)
    ref = moe_mlp_ragged(x, wg, wu, wd, probs, idx)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    es = NamedSharding(mesh, P("dp", None, None))
    wgs, wus, wds = (jax.device_put(w, es) for w in (wg, wu, wd))
    ps = jax.device_put(probs, NamedSharding(mesh, P("dp", None)))
    ids = jax.device_put(idx, NamedSharding(mesh, P("dp", None)))

    @jax.jit
    def f(x, wg, wu, wd, p, i):
        return moe_mlp_adp(x, wg, wu, wd, p, i, mesh, dp_axis="dp")

    got = f(xs, wgs, wus, wds, ps, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert "dp" in str(got.sharding.spec)


def test_adp_capacity_drop():
    """Finite capacity drops overflow pairs to zero contribution but
    never corrupts surviving rows."""
    mesh = make_mesh(4)
    x, wg, wu, wd, probs, idx = rand_moe(T=16, k=2, seed=2)
    # force every pair to expert 0 -> all route to shard 0, overflow
    idx0 = jnp.zeros_like(idx)
    full = moe_mlp_adp(x, wg, wu, wd, probs, idx0, mesh)
    ref = moe_mlp_ragged(x, wg, wu, wd, probs, idx0)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    capped = moe_mlp_adp(x, wg, wu, wd, probs, idx0, mesh, capacity=2)
    # per local shard: 4 tokens x 2 pairs = 8 pairs to shard 0, cap 2
    # survive; others contribute zero — every row is either exact or
    # missing a term, never garbage
    capped = np.asarray(capped)
    ref = np.asarray(ref)
    assert np.isfinite(capped).all()
    # every row is a sub-sum of its two pair terms: full, one pair, or
    # zero. With all pairs on one expert, each pair term is
    # prob_j * expert0(x_t), so row_t ∈ {0, p0, p1, p0+p1} * e0(x_t).
    probs_np = np.asarray(probs)
    e0 = ref / probs_np.sum(axis=1, keepdims=True)  # expert0 output rows
    for t in range(capped.shape[0]):
        cands = [0.0, probs_np[t, 0], probs_np[t, 1],
                 probs_np[t, 0] + probs_np[t, 1]]
        assert any(np.allclose(capped[t], c * e0[t], rtol=1e-4, atol=1e-5)
                   for c in cands), t
    # capacity 2 of 8 pairs per shard: something survives, most drops
    assert np.any(np.abs(capped) > 1e-6)
    assert np.abs(capped).sum() < np.abs(ref).sum()


def test_adp_uneven_expert_load():
    """Skewed routing (most pairs to one shard) stays exact with full
    capacity."""
    mesh = make_mesh(4)
    x, wg, wu, wd, probs, idx = rand_moe(T=24, k=2, seed=3)
    skew = jnp.where(jnp.arange(24 * 2).reshape(24, 2) % 5 == 0,
                     idx, jnp.ones_like(idx))
    ref = moe_mlp_ragged(x, wg, wu, wd, probs, skew)
    got = moe_mlp_adp(x, wg, wu, wd, probs, skew, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
