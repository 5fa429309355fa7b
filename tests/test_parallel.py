"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: in-process multi-worker fixture analog)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@needs_8
def test_tp_sharded_logits_match_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import LlamaConfig
    import __graft_entry__ as ge

    hf = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=8,
                     num_key_value_heads=4, max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=4, dp=2)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))

    T = 8
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    kv = model.make_kv_pages(16, 16)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)

    ref_logits, _ = model.forward(params, tokens, kv, md)

    mesh = mapping.build_mesh()
    pspecs = model.param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward(p, t, k, m)

    with mesh:
        logits, _ = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)


@needs_8
def test_tp_shard_map_attention_matches():
    """The shard_map'd attention path (used when pallas kernels can't be
    GSPMD-partitioned) must match the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import LlamaConfig
    import __graft_entry__ as ge

    hf = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=8,
                     num_key_value_heads=4, max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=4, dp=2)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T = 8
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)
    ref_logits, _ = model.forward(params, tokens,
                                  model.make_kv_pages(16, 16), md)

    mesh = mapping.build_mesh()
    model.mesh = mesh           # activates the shard_map path
    assert model.attn_shard_args()[1] == "tp"
    pspecs = model.param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward(p, t, k, m)

    with mesh:
        logits, _ = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)


@needs_8
def test_true_pp_pipelined_forward_matches():
    """GPipe-scheduled forward (micro-batches + ppermute) over pp=2 x
    tp=2 x dp=2 must match the plain single-device forward.
    (reference: _executor_loop_pp py_executor.py:1811)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import LlamaConfig
    import __graft_entry__ as ge

    hf = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=4, num_attention_heads=8,
                     num_key_value_heads=4, max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=2, pp=2, dp=2)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T = 8
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)
    ref_logits, ref_kv = model.forward(params, tokens,
                                       model.make_kv_pages(16, 16), md)

    mesh = mapping.build_mesh()
    model.mesh = mesh
    pspecs = model.param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward_pp(p, t, k, m, num_microbatches=2)

    with mesh:
        logits, kv = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)
    # KV pool must match too (each stage wrote its local layers)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(ref_kv),
                               rtol=5e-3, atol=5e-3)
    # the compiled program must contain the stage handoff collective
    with mesh:
        txt = fwd.lower(sparams, tokens, skv, md).compile().as_text()
    assert "collective-permute" in txt


@needs_8
def test_mapping_mesh_axes():
    from tensorrt_llm_tpu.mapping import Mapping
    m = Mapping.from_sizes(tp=2, dp=2, pp=2)
    mesh = m.build_mesh()
    assert mesh.shape == {"dp": 2, "pp": 2, "cp": 1, "tp": 2}
    assert m.pp_layers(5) == [range(0, 2), range(2, 5)]


@needs_8
def test_ulysses_cp_forward_matches_single_device():
    """cp=2 x tp=2 Ulysses: token-sharded activations, heads shard_map'd
    over ("cp","tp") — logits must match the unsharded forward.
    (reference: CpType.ULYSSES, _torch/modules/attention.py:1276)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import LlamaConfig
    import __graft_entry__ as ge

    hf = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=8,
                     num_key_value_heads=4, max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=2, cp=2, dp=2)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T = 8
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)
    ref_logits, _ = model.forward(params, tokens,
                                  model.make_kv_pages(16, 16), md)

    mesh = mapping.build_mesh()
    model.mesh = mesh
    assert model.attn_shard_args()[1] == ("cp", "tp")
    pspecs = model.param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward(p, t, k, m)

    with mesh:
        logits, _ = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)


@needs_8
def test_moe_ep_shard_map_matches_ragged():
    """EP shard_map path (local grouped GEMMs + psum combine) must match
    the single-device ragged path bit-closely."""
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.ops.moe import (moe_mlp_ep, moe_mlp_ragged,
                                          topk_routing)

    T, H, I, E, k = 12, 32, 48, 8, 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    w_gate = jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)), jnp.float32)
    probs, idx = topk_routing(x @ router, k)

    ref = moe_mlp_ragged(x, w_gate, w_up, w_down, probs, idx)

    mesh = Mapping.from_sizes(tp=4, dp=2).build_mesh()
    with mesh:
        out = jax.jit(lambda *a: moe_mlp_ep(
            *a, mesh=mesh, ep_axes=("cp", "tp")))(
                x, w_gate, w_up, w_down, probs, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@needs_8
def test_mixtral_ep_forward_matches_single_device():
    """Mixtral with experts sharded over (cp, tp) — EP shard_map path —
    matches the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import MixtralConfig
    import __graft_entry__ as ge

    hf = MixtralConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=96, num_hidden_layers=2,
                       num_attention_heads=8, num_key_value_heads=4,
                       num_local_experts=8, num_experts_per_tok=2,
                       max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=4, dp=2)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T = 8
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)
    ref_logits, _ = model.forward(params, tokens,
                                  model.make_kv_pages(16, 16), md)

    mesh = mapping.build_mesh()
    model.mesh = mesh           # activates shard_map attention + EP moe
    pspecs = model.param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward(p, t, k, m)

    with mesh:
        logits, _ = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)


def test_dwdp_weight_sharding_parity():
    """DWDP: weights dp-sharded at rest, gathered per layer in the scan
    — logits must match the replicated run exactly, and the committed
    per-device weight bytes must shrink (reference: dwdp.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tests.test_models import build_pair, make_prefill_metadata
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.models.llama import (
        LlamaForCausalLM as TpuLlama)
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=4, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      tie_word_embeddings=False)
    # replicated baseline
    model, params, tmodel = build_pair(cfg, LlamaForCausalLM)
    tokens = list(range(2, 12))
    kv = model.make_kv_pages(16, 16)
    md = make_prefill_metadata(model, len(tokens))
    base_logits, _ = model.forward(params, jnp.asarray(tokens, jnp.int32),
                                   kv, md)

    mapping = Mapping.from_sizes(tp=2, dp=4, enable_dwdp=True)
    mesh = mapping.build_mesh()
    mc = ModelConfig(hf_config=cfg, dtype=jnp.float32,
                     quant_config=model.config.quant_config,
                     mapping=mapping)
    dmodel = TpuLlama(mc)
    dmodel.attn_backend = "reference"
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in tmodel.state_dict().items()}
    dparams = dmodel.load_hf_state_dict(sd)
    pspecs = dmodel.param_pspecs(dparams)
    # weight leaves must carry the dp axis somewhere
    qspec = pspecs["layers"]["q"]["weight"]
    assert "dp" in jax.tree.leaves(
        jax.tree.map(lambda s: str(s), qspec))[0] or "dp" in str(qspec)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        dparams, pspecs)
    # per-device bytes of q weights shrink 8x (tp2 x dp4)
    q = sharded["layers"]["q"]["weight"]
    assert q.addressable_shards[0].data.size * 8 == q.size

    kv2 = dmodel.make_kv_pages(16, 16)
    with mesh:
        logits, _ = jax.jit(dmodel.forward)(
            sharded, jnp.asarray(tokens, jnp.int32), kv2, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(base_logits),
                               rtol=2e-4, atol=2e-4)


def test_wide_ep_balancer_and_parity():
    """Wide-EP (reference: fused_moe_wide_ep.py + EPLB): hot experts
    get replica slots across shards; routed outputs stay numerically
    identical to the single-copy expert table."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.ops.moe import (moe_mlp_ragged, moe_mlp_wide_ep,
                                          topk_routing)
    from tensorrt_llm_tpu.ops.moe_balancer import (build_replica_tables,
                                                   eplb_placement)

    # ---- balancer math ----
    loads = [100.0, 1.0, 1.0, 1.0]          # expert 0 is hot
    placement = eplb_placement(loads, num_slots=8, num_shards=4)
    rep_count, rep_slots = build_replica_tables(placement, 4)
    assert sorted(set(placement.tolist())) == [0, 1, 2, 3]  # all present
    assert rep_count[0] == 5                # hot expert replicated most
    # every shard holds 2 slots and the hot expert is spread out
    holders = {s for s, e in enumerate(placement) if e == 0}
    assert len({h // 2 for h in holders}) >= 4  # on all 4 shards

    # ---- numerical parity on an 8-way mesh (ep over cp*tp=4) ----
    rng = np.random.default_rng(0)
    E, H, I, T, k = 4, 32, 64, 16, 2
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)), jnp.float32)
    logits = jnp.dot(x, router)
    probs, eidx = topk_routing(logits, k)

    ref = moe_mlp_ragged(x, wg, wu, wd, probs, eidx)

    mapping = Mapping.from_sizes(tp=2, cp=2, dp=2)
    mesh = mapping.build_mesh()
    pl_ = jnp.asarray(placement)
    slots = (wg[pl_], wu[pl_], wd[pl_])
    rc = jnp.asarray(rep_count)
    rs = jnp.asarray(rep_slots)
    with mesh:
        got = jax.jit(lambda x, a, b, c: moe_mlp_wide_ep(
            x, a, b, c, probs, eidx, rc, rs, mesh))(x, *slots)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_wide_ep_e2e_rebalance(tmp_path):
    """LLM.rebalance_moe installs replica-slot tables; greedy outputs
    are unchanged (placement is numerically transparent)."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    torch.manual_seed(0)
    cfg = MixtralConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=96, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        num_local_experts=4, num_experts_per_tok=2,
                        max_position_embeddings=256,
                        tie_word_embeddings=False)
    tmodel = MixtralForCausalLM(cfg).eval()
    llm = LLM(model=tmodel, skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    sp = SamplingParams(max_tokens=8, top_k=1)
    ref = llm.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    llm.rebalance_moe([10.0, 1.0, 1.0, 1.0])
    assert "w_gate_slots" in llm.engine.params["layers"]
    got = llm.generate([5, 9, 23, 44], sp).outputs[0].token_ids
    llm.shutdown()
    assert got == ref


def test_mixtral_adp_forward_matches_single_device():
    """Attention-DP Mixtral: tokens dp-sharded, experts EP over the same
    devices, ragged all-to-all-style dispatch (ops/moe.py moe_mlp_adp;
    reference DEPn layout, moeAlltoAllKernels.cu) — logits match the
    unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import MixtralConfig
    import __graft_entry__ as ge

    hf = MixtralConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=96, num_hidden_layers=2,
                       num_attention_heads=8, num_key_value_heads=4,
                       num_local_experts=8, num_experts_per_tok=2,
                       max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=2, dp=4, enable_attention_dp=True)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T = 8
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)
    ref_logits, _ = model.forward(params, tokens,
                                  model.make_kv_pages(16, 16), md)

    mesh = mapping.build_mesh()
    model.mesh = mesh
    pspecs = model.param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward(p, t, k, m)

    with mesh:
        logits, _ = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)


def test_ring_cp_forward_matches_single_device():
    """RING context parallelism (ops/cp_ring.py): KV pages sharded over
    cp, ownership-masked writes, exact LSE combine — logits match the
    unsharded forward on mixed prefill+decode metadata (reference:
    CpType.RING mapping.py:25, kernels/recoverFromRingAtten.h;
    decode-phase KV-shard role: helixKernels.cu)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import CpType, Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import LlamaConfig
    import __graft_entry__ as ge

    hf = LlamaConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=8, num_key_value_heads=4,
                     max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=2, cp=2, dp=2, cp_type=CpType.RING)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T = 12
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)
    kv0 = model.make_kv_pages(16, 16)
    ref_logits, ref_kv = model.forward(params, tokens, kv0, md)

    mesh = mapping.build_mesh()
    model.mesh = mesh
    assert model.ring_cp_active()
    pspecs = model.param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    assert "cp" in str(model.kv_pspec())   # pages sharded over cp
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward(p, t, k, m)

    with mesh:
        logits, new_kv = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)
    # the written KV matches too (ownership-masked writes reassemble
    # into the same global pool)
    np.testing.assert_allclose(np.asarray(new_kv), np.asarray(ref_kv),
                               rtol=5e-3, atol=5e-3)


def test_helix_cp_forward_matches_single_device():
    """HELIX CP (reference: mapping.py:533 repurpose_helix_cp_to_tp +
    helixKernels.cu): ring-style KV-page-sharded attention with the cp
    ranks repurposed as extra FFN tensor parallelism — MLP weights shard
    over (cp, tp). Logits match the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrt_llm_tpu.mapping import CpType, Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from transformers import LlamaConfig
    import __graft_entry__ as ge

    hf = LlamaConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=8, num_key_value_heads=4,
                     max_position_embeddings=256)
    mapping = Mapping.from_sizes(tp=2, cp=2, dp=2, cp_type=CpType.HELIX)
    mc = ModelConfig(hf_config=hf, dtype=jnp.float32, mapping=mapping)
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T = 12
    tokens = jnp.asarray(np.arange(T) % 120, jnp.int32)
    md = ge._example_metadata(T, max_seqs=2, pages_per_seq=8)
    ref_logits, _ = model.forward(params, tokens,
                                  model.make_kv_pages(16, 16), md)

    mesh = mapping.build_mesh()
    model.mesh = mesh
    assert model.ring_cp_active()
    pspecs = model.param_pspecs(params)
    # FFN weights really repurpose cp as tp
    assert "cp" in str(pspecs["layers"]["gate"]["weight"])
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    sparams = jax.device_put(params, shardings)
    skv = jax.device_put(model.make_kv_pages(16, 16),
                         NamedSharding(mesh, model.kv_pspec()))

    @jax.jit
    def fwd(p, t, k, m):
        return model.forward(p, t, k, m)

    with mesh:
        logits, _ = fwd(sparams, tokens, skv, md)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)
