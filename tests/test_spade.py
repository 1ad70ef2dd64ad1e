"""SPADE generator: numerical parity against the reference torch
SPADEGenerator4 with randomly initialized, spectral-norm-wrapped weights
ported via sln_tpu.spade.port."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sln_tpu.spade import port
from sln_tpu.spade.generator import SPADEGenerator4
from sln_tpu.spade.layers import layer_norm_2d


@pytest.fixture(scope="module")
def torch_ref():
    import sys
    sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module("models.SPADE_related")


def test_layer_norm_2d_matches_torch(torch_ref):
    import torch
    ln = torch_ref.LayerNorm2D(8, affine=False)
    x = np.random.default_rng(0).standard_normal((2, 8, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        ref = ln(torch.from_numpy(x)).numpy()
    ours = np.asarray(layer_norm_2d(jnp.asarray(
        x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("crop", [64])
def test_generator4_parity(torch_ref, crop):
    import torch
    torch.manual_seed(0)
    ngf = 16
    ref = torch_ref.SPADEGenerator4(
        semantic_nc=41, target_nc=3, nz=32, ngf=ngf,
        norm="spectralspadelayer3x3", crop_size=crop, n_up="normal")
    ref.eval()

    rng = np.random.default_rng(1)
    seg = rng.uniform(0, 1, (1, 41, crop, crop)).astype(np.float32)
    seg[:, 0] = seg[:, 0] * 2 - 1            # depth channel in [-1, 1]
    z = rng.standard_normal((1, 32)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(seg), torch.from_numpy(z)).numpy()

    params = port.port_spade_generator4(ref.state_dict(), ngf=ngf)
    model = SPADEGenerator4(semantic_nc=41, target_nc=3, nz=32, ngf=ngf,
                            crop_size=crop, n_up="normal")
    out = model.apply({"params": params},
                      jnp.asarray(seg.transpose(0, 2, 3, 1)),
                      jnp.asarray(z))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=1e-3, atol=2e-3)


def test_generator4_shapes_and_range():
    model = SPADEGenerator4(ngf=16, nz=32, crop_size=64)
    seg = jnp.zeros((2, 64, 64, 41))
    z = jnp.ones((2, 32))
    params = model.init(jax.random.PRNGKey(0), seg, z)["params"]
    out = model.apply({"params": params}, seg, z)
    assert out.shape == (2, 64, 64, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_generator4_bf16_compute_close_to_fp32():
    """bfloat16 compute dtype (params fp32) must track the fp32 path to
    image tolerance — the TPU-fast inference mode (SpadeConfig
    .compute_dtype); outputs are tanh'd into [-1, 1] so 3e-2 abs is
    invisible in 8-bit RGB."""
    model32 = SPADEGenerator4(ngf=16, nz=32, crop_size=64)
    model16 = SPADEGenerator4(ngf=16, nz=32, crop_size=64,
                              dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(3)
    seg = jax.random.uniform(key, (2, 64, 64, 41))
    z = jax.random.normal(jax.random.fold_in(key, 1), (2, 32))
    params = model32.init(jax.random.PRNGKey(0), seg, z)["params"]
    out32 = model32.apply({"params": params}, seg, z)
    out16 = model16.apply({"params": params}, seg, z)
    assert out16.dtype == jnp.float32          # output contract is fp32
    diff = np.abs(np.asarray(out16) - np.asarray(out32))
    assert diff.max() < 0.1, diff.max()        # worst pixel < ~13/255
    assert diff.mean() < 8e-3, diff.mean()     # typical error ~1.5/255


def test_classic_spade_generator_shapes():
    from sln_tpu.spade.classic import SPADEGenerator
    model = SPADEGenerator(ngf=8, nz=16, crop_size=64)
    seg = jnp.zeros((1, 64, 64, 41))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16))
    params = model.init(jax.random.PRNGKey(1), seg, z)["params"]
    out = model.apply({"params": params}, seg, z)
    assert out.shape == (1, 64, 64, 3)
    assert float(jnp.abs(out).max()) <= 1.0
