"""Wan VAE tests: shapes, streaming-cache consistency, roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbodiffusion_tpu.models.vae import (
    VAEConfig, init_vae_params, vae_decode, vae_encode, decoder_apply)


TEST_CFG = VAEConfig(dim=16, dtype=jnp.float32)


@pytest.fixture(scope="module")
def vae_params():
    return init_vae_params(jax.random.PRNGKey(0), TEST_CFG)


def test_decode_shape(vae_params):
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 4, 4))
    video = vae_decode(vae_params, z)
    # T_pixel = 1 + 4*(T_lat-1); spatial 8x (wan2pt1.py:708-740)
    assert video.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(np.asarray(video)).all()


def test_encode_shape(vae_params):
    video = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 9, 32, 32))
    z = vae_encode(vae_params, video)
    assert z.shape == (1, 16, 3, 4, 4)
    assert np.isfinite(np.asarray(z)).all()


def test_decode_chunk_invariance(vae_params):
    """Streaming with different chunk sizes must agree exactly — validates
    the explicit cache pytree against the reference's mutable feat_cache
    semantics (wan2pt1.py:520-537)."""
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 5, 4, 4))
    v1 = vae_decode(vae_params, z, chunk=1)
    v2 = vae_decode(vae_params, z, chunk=2)
    v4 = vae_decode(vae_params, z, chunk=4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v4),
                               rtol=1e-4, atol=1e-4)


def test_first_frame_only_decode(vae_params):
    """A single latent frame decodes to a single pixel frame."""
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 1, 4, 4))
    video = vae_decode(vae_params, z)
    assert video.shape == (1, 3, 1, 32, 32)


def test_first_frame_independent_of_later_frames(vae_params):
    """Causality: pixel frame 0 must not depend on latent frames >= 1."""
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 3, 4, 4))
    z2 = z.at[:, :, 1:].set(jax.random.normal(jax.random.PRNGKey(6),
                                              (1, 16, 2, 4, 4)))
    v1 = vae_decode(vae_params, z)
    v2 = vae_decode(vae_params, z2)
    np.testing.assert_allclose(np.asarray(v1[:, :, 0]), np.asarray(v2[:, :, 0]),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(v1[:, :, 1:]) - np.asarray(v2[:, :, 1:])).max() > 1e-3


def test_encode_decode_roundtrip_shape(vae_params):
    video = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 5, 32, 32)) * 0.5
    z = vae_encode(vae_params, video)
    recon = vae_decode(vae_params, z)
    assert recon.shape == video.shape




def test_decode_pad128_equivalence():
    """Lane-padding the 96-channel decode stage to 128 (_pad_decoder_c96)
    must be numerically exact: padded input channels are identically zero
    and the channel-RMS sqrt(C) factor is folded into the fp32 gamma. Run
    at the REAL channel widths (dim=96 — the tiny test config never hits
    the padded stage) on a small spatial grid."""
    from turbodiffusion_tpu.models.vae import _vae_decode

    cfg = VAEConfig(dtype=jnp.float32)          # real widths, fp32
    params = init_vae_params(jax.random.PRNGKey(5), cfg)
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 3, 6, 6))
    ref = _vae_decode(params, z, chunk=2, pad128=False)
    got = _vae_decode(params, z, chunk=2, pad128=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
