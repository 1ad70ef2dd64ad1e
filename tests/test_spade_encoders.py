"""PSP-SE encoders + MMD discriminators: shapes and finiteness."""

import numpy as np
import jax
import jax.numpy as jnp

from sln_tpu.spade.encoders import (ConvEncoderPSPSE,
                                    MultiscaleDiscriminatorMMD, PSPModule,
                                    SEResBlock3, adaptive_avg_pool)


def test_adaptive_avg_pool_exact():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = adaptive_avg_pool(x, 2)
    expected = np.array([[[2.5], [4.5]], [[10.5], [12.5]]])
    np.testing.assert_allclose(np.asarray(out)[0], expected)


def test_psp_module():
    m = PSPModule(out_features=16)
    x = jnp.zeros((1, 32, 32, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 32, 32, 16)


def test_se_res_block3():
    m = SEResBlock3(features=16, stride=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    v = m.init(jax.random.PRNGKey(1), x, False)
    out = m.apply(v, x, False)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_conv_encoder_psp_se_vae_and_z():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    mv = ConvEncoderPSPSE(nef=4, output_nc=16, vae=True)
    v = mv.init(jax.random.PRNGKey(1), x, False)
    mu, logvar = mv.apply(v, x, False)
    assert mu.shape == (1, 16) and logvar.shape == (1, 16)

    mz = ConvEncoderPSPSE(nef=4, output_nc=16, vae=False)
    v = mz.init(jax.random.PRNGKey(1), x, False)
    z = mz.apply(v, x, False)
    assert z.shape == (1, 16)


def test_mmd_discriminator_heads():
    d = MultiscaleDiscriminatorMMD(ndf=8, n_layers=3, num_d=2, nz=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 44))
    v = d.init(jax.random.PRNGKey(1), x, False)
    outs = d.apply(v, x, False)
    assert len(outs) == 2
    logits, z = outs[0][-1]
    assert logits.shape[-1] == 1
    assert z.shape == (2, 32)
    assert np.isfinite(np.asarray(z)).all()


def test_mmd_encoders_shapes():
    from sln_tpu.spade.encoders import (ConvEncoderPSPSEMMD,
                                        ConvEncoderPSPSEMMD2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    for cls in (ConvEncoderPSPSEMMD, ConvEncoderPSPSEMMD2):
        m = cls(nef=2, output_nc=16)
        v = m.init(jax.random.PRNGKey(1), x, False)
        z = m.apply(v, x, False)
        assert z.shape == (2, 16), cls.__name__
        assert np.isfinite(np.asarray(z)).all()
        # spectral norm state exists (power-iteration collection)
        assert "spectral" in v
