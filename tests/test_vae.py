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
