"""VAE decoder shape/finiteness tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp

from rectified_spaattn_tpu.models.vae import VAEConfig, VAEDecoder, tiled_decode


def test_video_decoder_shapes():
    cfg = VAEConfig.tiny(video=True)
    dec = VAEDecoder(cfg)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (1, cfg.latent_channels, 3, 4, 4))
    params = dec.init(rng, lat)
    out = dec.apply(params, lat)
    # one temporal-up (causal: 2T-1) and one spatial-up block
    assert out.shape == (1, 3, 5, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_image_decoder_shapes():
    cfg = VAEConfig.tiny(video=False)
    dec = VAEDecoder(cfg)
    rng = jax.random.PRNGKey(1)
    lat = jax.random.normal(rng, (1, cfg.latent_channels, 6, 6))
    params = dec.init(rng, lat)
    out = dec.apply(params, lat)
    assert out.shape == (1, 3, 12, 12)


def test_tiled_decode_matches_full_for_linear_decoder():
    # oracle decoder: 2x nearest upsample (linear, so blending is exact
    # away from boundary effects — use a constant field for exactness)
    def dec(lat):
        x = np.asarray(lat)
        x = np.repeat(np.repeat(x, 2, axis=-2), 2, axis=-1)
        return x
    lat = np.ones((1, 2, 40, 40), np.float32) * 3.0
    full = dec(lat)
    tiled = tiled_decode(dec, lat, tile=16, overlap=4)
    np.testing.assert_allclose(tiled, full, rtol=1e-6)


def test_encoder_decoder_roundtrip_shapes():
    """encode(decode-shaped pixels) returns the latent grid the decoder
    upsamples from — the conditioning spine for every I2V path."""
    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.models import VAEConfig, VAEEncoder

    cfg = VAEConfig.tiny(video=True)
    enc = VAEEncoder(cfg)
    # decoder tiny: temporal_upsample (True, False), spatial (True, False)
    # -> pixel T = 2t-1, H = 2h, W = 2w
    t, h, w = 3, 4, 4
    pix = jnp.zeros((1, 3, 2 * t - 1, 2 * h, 2 * w))
    # encoder in_channels = pixel channels; VAEConfig.out_channels is the
    # DECODER output (pixels); encoder input is likewise pixels
    params = enc.init(jax.random.PRNGKey(0), pix)
    z = enc.apply(params, pix)
    assert z.shape == (1, cfg.latent_channels, t, h, w)


def test_encoder_mid_attention_params_present():
    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.models import VAEConfig, VAEEncoder, VAEDecoder

    cfg = VAEConfig(latent_channels=4, block_out_channels=(8, 16),
                    layers_per_block=1, temporal_upsample=(True, False),
                    spatial_upsample=(True, False), video=True,
                    mid_attention=True)
    enc = VAEEncoder(cfg)
    pix = jnp.zeros((1, 3, 3, 8, 8))
    p = enc.init(jax.random.PRNGKey(0), pix)
    assert "mid_attn" in p["params"]
    dec = VAEDecoder(cfg)
    lat = jnp.zeros((1, 4, 2, 4, 4))
    pd = dec.init(jax.random.PRNGKey(0), lat)
    assert "mid_attn" in pd["params"]


def test_latents_mean_std_normalisation_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from rectified_spaattn_tpu.models.vae import (
        VAEConfig, normalize_latents, denormalize_latents)

    cfg = VAEConfig(latent_channels=4,
                    latents_mean=(0.1, -0.2, 0.3, 0.0),
                    latents_std=(2.0, 1.0, 0.5, 3.0))
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 2, 4, 4)))
    back = denormalize_latents(normalize_latents(z, cfg), cfg)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), rtol=1e-6,
                               atol=1e-6)
