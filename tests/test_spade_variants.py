"""Numerical parity of the experimental SPADE variants 2/3/5 against the
reference torch modules (ported weights): norm layers, residual blocks,
and generator 3 end-to-end; shape/range checks for generators 2 and 5."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sln_tpu.spade import port as port_lib
from sln_tpu.spade.variants import (SPADE2, SPADE3, SPADE5,
                                    SPADEGeneratorV, SPADEResnetBlockV)


@pytest.fixture(scope="module")
def ref():
    import importlib
    import sys
    sys.path.insert(0, "/root/reference")
    return importlib.import_module("models.SPADE_related")


def _conv(sd, prefix, spectral=False):
    return port_lib._conv(sd, prefix, spectral)


def _j(prefix, name):
    return prefix + "." + name if prefix else name


def _port_spade(sd, prefix, variant):
    if variant == 2:
        return {
            "mlp_preshared_depth": _conv(sd, _j(prefix, "mlp_preshared_depth.0")),
            "mlp_preshared_label": _conv(sd, _j(prefix, "mlp_preshared_label.0")),
            "mlp_shared": _conv(sd, _j(prefix, "mlp_shared.0")),
            "mlp_gamma": _conv(sd, _j(prefix, "mlp_gamma")),
            "mlp_beta": _conv(sd, _j(prefix, "mlp_beta")),
        }
    if variant == 3:
        return {
            "mlp_preshared_depth": {"conv": _conv(
                sd, _j(prefix, "mlp_preshared_depth.1"))},
            "mlp_preshared_label": _conv(sd, _j(prefix, "mlp_preshared_label.0")),
            "mlp_shared": {"conv": _conv(sd, _j(prefix, "mlp_shared.1"))},
            "mlp_gamma": {"conv": _conv(sd, _j(prefix, "mlp_gamma.1"))},
            "mlp_beta": {"conv": _conv(sd, _j(prefix, "mlp_beta.1"))},
        }
    # variant 5
    return {
        "mlp_preshared_depth": {"conv": _conv(
            sd, _j(prefix, "mlp_preshared_depth.1"))},
        "mlp_shared": {"conv": _conv(sd, _j(prefix, "mlp_shared.1"))},
        "mlp_gamma": {"conv": _conv(sd, _j(prefix, "mlp_gamma.1"))},
        "mlp_beta": {"conv": _conv(sd, _j(prefix, "mlp_beta.1"))},
    }


def _port_block(sd, prefix, variant, fin, fout, spectral):
    def blk_conv(name):
        if spectral:
            return {"conv": _conv(sd, _j(prefix, f"{name}.1"), True)}
        return _conv(sd, _j(prefix, name))

    out = {"conv_0": blk_conv("conv_0"), "conv_1": blk_conv("conv_1"),
           "norm_0": _port_spade(sd, _j(prefix, "norm_0"), variant),
           "norm_1": _port_spade(sd, _j(prefix, "norm_1"), variant)}
    if variant == 3:
        out["se"] = {
            "fc1": {"kernel": port_lib._np(
                sd[_j(prefix, "se.fc.0.weight")]).T.copy()},
            "fc2": {"kernel": port_lib._np(
                sd[_j(prefix, "se.fc.2.weight")]).T.copy()}}
    if fin != fout:
        out["conv_s"] = _conv(sd, _j(prefix, "conv_s"), spectral)
        out["norm_s"] = _port_spade(sd, _j(prefix, "norm_s"), variant)
    return out


def _rand_inputs(rng, B=2, H=16, C=8, L=41):
    x = rng.standard_normal((B, H, H, C)).astype(np.float32)
    seg = rng.uniform(0, 1, (B, 32, 32, L)).astype(np.float32)
    seg[..., 0] = rng.uniform(-1, 1, (B, 32, 32))
    return x, seg


@pytest.mark.parametrize("variant", [2, 3, 5])
def test_spade_norm_parity(ref, variant, seed=0):
    import torch
    torch.manual_seed(seed)
    C = 8
    cls = {2: ref.SPADE2, 3: ref.SPADE3, 5: ref.SPADE5}[variant]
    t_mod = cls("spadeinstance3x3", C, 41)
    t_mod.eval()
    rng = np.random.default_rng(seed)
    x, seg = _rand_inputs(rng, C=C)
    with torch.no_grad():
        want = t_mod(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(seg.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    mine = {2: SPADE2, 3: SPADE3, 5: SPADE5}[variant](
        norm_nc=C, param_free="instance")
    params = _port_spade(t_mod.state_dict(), "", variant)
    got = mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant,spectral", [(2, False), (3, True),
                                              (5, True)])
def test_spade_block_parity(ref, variant, spectral):
    import torch
    torch.manual_seed(1)
    # fout >= 8 so the reference SE hidden dim (fout // 8) is nonzero
    fin, fout = 8, 16
    norm = ("spectral" if spectral else "") + "spadeinstance3x3"
    cls = {2: ref.SPADEResnetBlock2, 3: ref.SPADEResnetBlock3,
           5: ref.SPADEResnetBlock5}[variant]
    t_mod = cls(fin, fout, norm, 41)
    t_mod.eval()
    rng = np.random.default_rng(2)
    x, seg = _rand_inputs(rng, C=fin)
    with torch.no_grad():
        want = t_mod(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(seg.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    mine = SPADEResnetBlockV(fin, fout, variant, 41, "instance")
    params = _port_block(t_mod.state_dict(), "", variant, fin, fout,
                         spectral)
    got = mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_generator3_parity(ref):
    import torch
    torch.manual_seed(3)
    # ngf >= 8 keeps every SE hidden dim (fout // 8) nonzero in torch
    ngf, crop, nz = 8, 64, 16
    t_gen = ref.SPADEGenerator3(41, 3, nz, ngf, "spectralspadeinstance3x3",
                                crop, "normal")
    t_gen.eval()
    rng = np.random.default_rng(4)
    seg = rng.uniform(0, 1, (2, crop, crop, 41)).astype(np.float32)
    z = rng.standard_normal((2, nz)).astype(np.float32)
    with torch.no_grad():
        want = t_gen(torch.from_numpy(seg.transpose(0, 3, 1, 2)),
                     torch.from_numpy(z))
    want = want.numpy().transpose(0, 2, 3, 1)

    sd = t_gen.state_dict()
    nf = ngf
    params = {"fc": {"kernel": port_lib._np(sd["fc.weight"]).T.copy(),
                     "bias": port_lib._np(sd["fc.bias"]).copy()},
              "conv_img": _conv(sd, "conv_img")}
    dims = [("head_0", 16 * nf, 16 * nf), ("G_middle_0", 16 * nf, 16 * nf),
            ("G_middle_1", 16 * nf, 16 * nf), ("up_0", 16 * nf, 8 * nf),
            ("up_1", 8 * nf, 4 * nf), ("up_2", 4 * nf, 2 * nf),
            ("up_3", 2 * nf, 1 * nf)]
    for name, fin, fout in dims:
        params[name] = _port_block(sd, name, 3, fin, fout, True)

    gen = SPADEGeneratorV(variant=3, nz=nz, ngf=ngf, crop_size=crop,
                          param_free="instance")
    got = gen.apply({"params": params}, jnp.asarray(seg), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("variant", [2, 5])
def test_generator_shapes(variant):
    gen = SPADEGeneratorV(variant=variant, nz=8, ngf=4, crop_size=64,
                          param_free="instance" if variant == 2
                          else "layer")
    seg = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 41)).astype(np.float32))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
    v = gen.init(jax.random.PRNGKey(1), seg, z)
    out = gen.apply(v, seg, z)
    assert out.shape == (1, 64, 64, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= -1.0 and o.max() <= 1.0


def test_generator5_rejects_more_most():
    gen = SPADEGeneratorV(variant=5, nz=8, ngf=4, crop_size=64,
                          n_up="more")
    seg = jnp.zeros((1, 64, 64, 41))
    z = jnp.zeros((1, 8))
    with pytest.raises(ValueError):
        gen.init(jax.random.PRNGKey(0), seg, z)
