"""Visual generation slice (VERDICT r4 missing #5).

Reference: tensorrt_llm/visual_gen (VisualGen facade + DiffusionExecutor
+ DiT pipelines). The TPU slice: a generic adaLN DiT denoiser, a fully
in-graph (lax.scan) Euler/DDIM denoise loop, and a batching executor.
"""
import numpy as np
import pytest

from tensorrt_llm_tpu.visual_gen import (DiffusionRequest, DiTConfig,
                                         DiTDenoiser, VisualGen,
                                         VisualGenParams)
from tensorrt_llm_tpu.visual_gen.pipeline import (DiffusionPipeline,
                                                  ddim_alphas,
                                                  flow_sigmas)

import jax
import jax.numpy as jnp


CFG = DiTConfig(latent_size=16, latent_channels=4, patch=2, hidden=64,
                depth=2, heads=2, cond_dim=32, dtype=jnp.float32)


def test_patchify_roundtrip():
    m = DiTDenoiser(CFG)
    x = np.random.default_rng(0).normal(
        size=(2, 16, 16, 4)).astype(np.float32)
    back = m.unpatchify(m.patchify(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-6)


def test_denoiser_shapes_and_determinism():
    m = DiTDenoiser(CFG)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 4))
    t = jnp.asarray([0.0, 500.0, 999.0])
    out1 = m(params, x, t)
    out2 = m(params, x, t)
    assert out1.shape == (3, 16, 16, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # timestep conditioning matters
    out3 = m(params, x, t + 100.0)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_schedules():
    s = flow_sigmas(10)
    assert s[0] == 1.0 and s[-1] == 0.0 and len(s) == 11
    assert np.all(np.diff(s) < 0)
    a = ddim_alphas(10)
    assert a[0] < 0.01                    # t=T-1: almost pure noise
    assert a[-1] == pytest.approx(1.0, abs=1e-4)
    assert np.all(np.diff(a) > 0)        # alpha-bar grows toward data


@pytest.mark.parametrize("sampler", ["euler", "ddim"])
def test_full_denoise_loop_jitted(sampler):
    pipe = DiffusionPipeline(CFG)
    p = VisualGenParams(num_inference_steps=4, sampler=sampler, seed=7)
    out = pipe.generate(2, p)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(out).all()
    # seeded determinism
    out2 = pipe.generate(2, p)
    np.testing.assert_array_equal(out, out2)


def test_guidance_changes_output():
    pipe = DiffusionPipeline(CFG)
    cond = np.random.default_rng(0).normal(
        size=(1, CFG.cond_dim)).astype(np.float32)
    base = pipe.generate(1, VisualGenParams(num_inference_steps=4,
                                            guidance_scale=1.0), cond)
    guided = pipe.generate(1, VisualGenParams(num_inference_steps=4,
                                              guidance_scale=4.0), cond)
    assert not np.allclose(base, guided)


def test_executor_batches_and_serves():
    vg = VisualGen(model=CFG, max_batch_size=4)
    try:
        p = VisualGenParams(num_inference_steps=3, seed=5)
        rs = [vg.executor.submit(DiffusionRequest(i, p))
              for i in range(3)]
        outs = [ch.get(timeout=300) for ch in rs]
        for o in outs:
            assert o.error is None
            assert o.latent.shape == (16, 16, 4)
        # facade path
        r = vg.generate(VisualGenParams(num_inference_steps=2))
        assert r.latent is not None
    finally:
        vg.shutdown()
