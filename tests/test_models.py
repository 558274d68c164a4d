"""Tiny-config smoke + integration tests for the DiT backbones: shapes,
determinism, Jenga permutation invertibility, and sparse-vs-dense attention
injection (SURVEY §4 implication (c))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.models import (
    HunyuanVideoConfig, HunyuanVideoDiT,
    WanConfig, WanDiT,
    FluxConfig, FluxDiT,
    CogVideoXConfig, CogVideoXDiT,
)
from rectified_spaattn_tpu.curves import gilbert_mapping


def perms(t, h, w):
    l2h, h2l = gilbert_mapping(t, h, w)
    return jnp.asarray(l2h), jnp.asarray(h2l)


@pytest.mark.slow
def test_hunyuan_tiny_forward():
    cfg = HunyuanVideoConfig.tiny()
    model = HunyuanVideoDiT(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, hh, ww = 1, 2, 8, 8
    latents = jax.random.normal(rng, (b, cfg.in_channels, t, hh, ww))
    text = jax.random.normal(rng, (b, 6, cfg.text_dim))
    mask = jnp.ones((b, 6), bool)
    ts = jnp.array([500.0])
    guidance = jnp.array([6.0])
    gt, gh, gw = t // cfg.patch_size_t, hh // cfg.patch_size, ww // cfg.patch_size
    l2h, h2l = perms(gt, gh, gw)
    params = model.init(rng, latents, ts, text, mask, guidance, h2l, l2h)
    out = model.apply(params, latents, ts, text, mask, guidance, h2l, l2h)
    assert out.shape == (b, cfg.out_channels, t, hh, ww)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic
    out2 = model.apply(params, latents, ts, text, mask, guidance, h2l, l2h)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_hunyuan_permutation_is_transparent_for_dense_attention():
    """With dense attention, permuting tokens then unpermuting must give
    (numerically) the same output as no permutation at all — rope travels
    with the tokens.  This validates the Jenga wiring end-to-end."""
    cfg = HunyuanVideoConfig.tiny()
    model = HunyuanVideoDiT(cfg)
    rng = jax.random.PRNGKey(1)
    b, t, hh, ww = 1, 2, 8, 8
    latents = jax.random.normal(rng, (b, cfg.in_channels, t, hh, ww))
    text = jax.random.normal(rng, (b, 6, cfg.text_dim))
    mask = jnp.ones((b, 6), bool)
    ts = jnp.array([10.0])
    g = jnp.array([6.0])
    gt, gh, gw = t // cfg.patch_size_t, hh // cfg.patch_size, ww // cfg.patch_size
    l2h, h2l = perms(gt, gh, gw)
    params = model.init(rng, latents, ts, text, mask, g, None, None)
    out_plain = model.apply(params, latents, ts, text, mask, g, None, None)
    out_perm = model.apply(params, latents, ts, text, mask, g, h2l, l2h)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_perm),
                               rtol=1e-3, atol=1e-4)


def test_wan_tiny_forward_and_per_token_timesteps():
    cfg = WanConfig.tiny()
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(2)
    b, t, hh, ww = 1, 2, 8, 8
    latents = jax.random.normal(rng, (b, cfg.in_channels, t, hh, ww))
    text = jax.random.normal(rng, (b, 5, cfg.text_dim))
    ts = jnp.array([500.0])
    params = model.init(rng, latents, ts, text)
    out = model.apply(params, latents, ts, text)
    assert out.shape == (b, cfg.out_channels, t, hh, ww)
    # per-token timesteps (Wan2.2 TI2V): [B, Sv]
    sv = (t // cfg.patch_size[0]) * (hh // cfg.patch_size[1]) * (ww // cfg.patch_size[2])
    ts_tok = jnp.full((b, sv), 500.0)
    out_tok = model.apply(params, latents, ts_tok, text)
    assert out_tok.shape == out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_tok),
                               rtol=1e-3, atol=1e-4)


def test_wan_i2v_image_cross():
    cfg = WanConfig.tiny(image_cross=True)
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(3)
    b, t, hh, ww = 1, 2, 4, 4
    latents = jax.random.normal(rng, (b, cfg.in_channels, t, hh, ww))
    text = jax.random.normal(rng, (b, 5, cfg.text_dim))
    img = jax.random.normal(rng, (b, 4, cfg.image_dim))
    ts = jnp.array([500.0])
    params = model.init(rng, latents, ts, text, img)
    out = model.apply(params, latents, ts, text, img)
    assert out.shape == (b, cfg.out_channels, t, hh, ww)


def test_flux_tiny_forward():
    cfg = FluxConfig.tiny()
    model = FluxDiT(cfg)
    rng = jax.random.PRNGKey(4)
    b, gh, gw = 1, 8, 8
    tokens = jax.random.normal(rng, (b, gh * gw, cfg.in_channels))
    text = jax.random.normal(rng, (b, 6, cfg.text_dim))
    pooled = jax.random.normal(rng, (b, cfg.pooled_dim))
    ts = jnp.array([0.5])
    g = jnp.array([3.5])
    params = model.init(rng, tokens, ts, text, pooled, g, gh, gw)
    out = model.apply(params, tokens, ts, text, pooled, g, gh, gw)
    assert out.shape == (b, gh * gw, cfg.out_channels)


def test_cogvideox_tiny_forward():
    cfg = CogVideoXConfig.tiny()
    model = CogVideoXDiT(cfg)
    rng = jax.random.PRNGKey(5)
    b, t, hh, ww = 1, 2, 8, 8
    latents = jax.random.normal(rng, (b, cfg.in_channels, t, hh, ww))
    text = jax.random.normal(rng, (b, 7, cfg.text_dim))
    ts = jnp.array([500.0])
    params = model.init(rng, latents, ts, text)
    out = model.apply(params, latents, ts, text)
    assert out.shape == (b, cfg.out_channels, t, hh, ww)


@pytest.mark.slow
def test_hunyuan_with_sparse_attention_close_to_dense():
    """Inject the full rectified sparse path (interpret kernel) into the
    tiny model; at moderate drop rates the output must stay close to the
    dense forward — the reference's core fidelity claim."""
    from rectified_spaattn_tpu.sparse import SparseConfig
    from rectified_spaattn_tpu.attention import attention
    from rectified_spaattn_tpu.curves import gilbert_block_neighbor_mask

    cfg = HunyuanVideoConfig.tiny()
    model = HunyuanVideoDiT(cfg)
    rng = jax.random.PRNGKey(6)
    b, t, hh, ww = 1, 4, 16, 16   # 4*8*8 = 256 visual tokens = 2 blocks
    latents = jax.random.normal(rng, (b, cfg.in_channels, t, hh, ww))
    st = 128
    text = jax.random.normal(rng, (b, st, cfg.text_dim))
    mask = jnp.zeros((b, st), bool).at[:, :20].set(True)
    ts = jnp.array([500.0])
    g = jnp.array([6.0])
    gt, gh, gw = t // cfg.patch_size_t, hh // cfg.patch_size, ww // cfg.patch_size
    l2h, h2l = perms(gt, gh, gw)
    sv = gt * gh * gw
    neighbors = jnp.asarray(gilbert_block_neighbor_mask(gt, gh, gw,
                                                        block_size=128))
    scfg = SparseConfig(top_k_floor=1, p_remain=0.5, layout="joint",
                        text_len=st)
    tlen = jnp.array([20], jnp.int32)

    sparse_fn = lambda q, k, v: attention(
        q, k, v, mode="sparse", cfg=scfg, neighbor_mask=neighbors,
        visual_len=sv, text_len_rt=tlen, interpret=True)
    dense_fn = lambda q, k, v: attention(
        q, k, v, mode="vanilla", cfg=scfg, visual_len=sv, text_len_rt=tlen)

    params = model.init(rng, latents, ts, text, mask, g, h2l, l2h, dense_fn)
    out_dense = model.apply(params, latents, ts, text, mask, g, h2l, l2h,
                            dense_fn)
    out_sparse = model.apply(params, latents, ts, text, mask, g, h2l, l2h,
                             sparse_fn)
    d = np.asarray(out_dense)
    s = np.asarray(out_sparse)
    rel = np.abs(s - d).mean() / (np.abs(d).mean() + 1e-8)
    assert np.isfinite(s).all()
    assert rel < 0.15, f"sparse deviates {rel:.3f} from dense"


def test_mlp_chunk_is_equal_to_unchunked():
    """mlp_chunk is a pure peak-HBM lever: identical params, identical
    math — chunked FFN evaluation must reproduce the unchunked forward
    (uneven chunk bounds included).  Covers Wan's CrossAttnBlock FFN and
    Hunyuan's DualStream ff + SingleStream fused proj_mlp/proj_out path."""
    import dataclasses

    # Wan (CrossAttnBlock -> MLP.chunk)
    cfg = WanConfig.tiny()
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(3)
    b, t, hh, ww = 1, 2, 8, 8
    latents = jax.random.normal(rng, (b, cfg.in_channels, t, hh, ww))
    text = jax.random.normal(rng, (b, 5, cfg.text_dim))
    ts = jnp.array([500.0])
    params = model.init(rng, latents, ts, text)
    want = model.apply(params, latents, ts, text)
    model3 = WanDiT(dataclasses.replace(cfg, mlp_chunk=3))  # 32 rows: uneven
    got = model3.apply(params, latents, ts, text)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-6, atol=1e-6)

    # Hunyuan (DualStreamBlock.ff + SingleStreamBlock fused path)
    hcfg = HunyuanVideoConfig.tiny()
    hmodel = HunyuanVideoDiT(hcfg)
    latents = jax.random.normal(rng, (b, hcfg.in_channels, t, hh, ww))
    htext = jax.random.normal(rng, (b, 6, hcfg.text_dim))
    mask = jnp.ones((b, 6), bool)
    guidance = jnp.array([6.0])
    gt = t // hcfg.patch_size_t
    gh = hh // hcfg.patch_size
    gw = ww // hcfg.patch_size
    l2h, h2l = perms(gt, gh, gw)
    hp = hmodel.init(rng, latents, ts, htext, mask, guidance, h2l, l2h)
    want = hmodel.apply(hp, latents, ts, htext, mask, guidance, h2l, l2h)
    hmodel3 = HunyuanVideoDiT(dataclasses.replace(hcfg, mlp_chunk=3))
    got = hmodel3.apply(hp, latents, ts, htext, mask, guidance, h2l, l2h)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-6, atol=1e-6)
