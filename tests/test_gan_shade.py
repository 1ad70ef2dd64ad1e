"""gan_shade: rasterizer channels -> SPADE input -> colorized PNGs."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from sln_tpu.config import (CameraConfig, DataConfig, RenderConfig,
                            SpadeConfig, default_config)
from sln_tpu.workloads import common, gan_shade


def test_layout_channels_to_spade_input():
    rng = np.random.default_rng(0)
    ch = rng.uniform(0, 1, (70, 32, 32)).astype(np.float32)
    ch[0] = rng.uniform(1, 8, (32, 32))
    ch[0, :4, :4] = -1.0          # infinity region
    out = gan_shade.layout_channels_to_spade_input(ch)
    assert out.shape == (32, 32, 41)
    assert out[..., 0].min() >= -1.0 and out[..., 0].max() <= 1.0
    assert set(np.unique(out[..., 1:])) <= {0.0, 1.0}


def test_run_gan_shade_writes_images(tmp_path):
    cfg = default_config()
    cfg = cfg.replace(
        data=DataConfig(max_objects=12, max_triples=36, max_on_rels=12),
        render=RenderConfig(camera=CameraConfig(image_size=64),
                            mesh_subdiv=1, shell_subdiv=2),
        spade=SpadeConfig(crop_size=64, ngf=8, nz=16, num_z=3))
    val_arrays, size_info = common.load_arrays(4, cfg, synthetic_seed=5)
    # vae model unused by the render path here but part of the signature
    gan_shade.run_gan_shade(None, None, val_arrays, size_info, cfg,
                            num_z=3, save_dir=str(tmp_path),
                            rooms=[str(int(val_arrays["room_ids"][0]))])
    pngs = [f for f in os.listdir(tmp_path) if f.endswith("_color.png")]
    assert len(pngs) == 3
    assert all(os.path.getsize(tmp_path / f) > 0 for f in pngs)


def test_colorize_sharded_matches_single_device():
    """z-sharded multi-chip colorize == single-device (8 CPU devices)."""
    from sln_tpu.parallel import mesh as meshlib
    from sln_tpu.spade.generator import SPADEGenerator4

    model = SPADEGenerator4(ngf=8, nz=16, crop_size=64)
    seg = np.random.default_rng(0).uniform(
        0, 1, (64, 64, 41)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 41)),
                        jnp.zeros((1, 16)))["params"]
    rgb_ref = gan_shade.colorize(model, params, seg, num_z=8, z_chunk=8)
    mesh = meshlib.make_mesh(num_data=4)
    rgb_sh = gan_shade.colorize(model, params, seg, num_z=8, z_chunk=8,
                                mesh=mesh)
    np.testing.assert_allclose(rgb_sh, rgb_ref, rtol=1e-5, atol=1e-5)
