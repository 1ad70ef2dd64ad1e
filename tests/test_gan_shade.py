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
    # vae model unused by the render path here but part of the signature;
    # the "random" sentinel keeps the test hermetic (random init at cfg
    # dims) even when the committed artifact exists — a missing explicit
    # path raises instead of silently producing noise
    gan_shade.run_gan_shade(None, None, val_arrays, size_info, cfg,
                            num_z=3, save_dir=str(tmp_path),
                            spade_checkpoint="random",
                            rooms=[str(int(val_arrays["room_ids"][0]))])
    pngs = [f for f in os.listdir(tmp_path) if f.endswith("_color.png")]
    assert len(pngs) == 3
    assert all(os.path.getsize(tmp_path / f) > 0 for f in pngs)


def test_resize_spade_input():
    """Resize to the model crop (the reference resizes its 1024px Blender
    reads to 256): depth stays continuous, masks re-binarize — and the
    output must be writable even when jax.image.resize hands back a
    read-only view (regression: in-place binarization crashed)."""
    rng = np.random.default_rng(2)
    spade_in = np.zeros((64, 64, 41), np.float32)
    spade_in[..., 0] = rng.uniform(-1, 1, (64, 64))
    cls = rng.integers(1, 41, (64, 64))
    idx = np.indices((64, 64))
    spade_in[idx[0], idx[1], cls] = 1.0
    out = gan_shade.resize_spade_input(spade_in, 32)
    assert out.shape == (32, 32, 41)
    assert set(np.unique(out[..., 1:])) <= {0.0, 1.0}
    assert out[..., 0].min() >= -1.0 and out[..., 0].max() <= 1.0
    # identity when already at crop size
    assert gan_shade.resize_spade_input(spade_in, 64) is spade_in


def test_shading_target_properties():
    """Deterministic target: right shape/range, albedo = class palette
    where flat, darker when farther, batch == per-image."""
    from sln_tpu.workloads.plot2d import MAPPED_COLORS

    rng = np.random.default_rng(1)
    seg = np.zeros((2, 32, 32, 41), np.float32)
    seg[..., 0] = rng.uniform(-1, 1, (2, 32, 32))
    cls = rng.integers(1, 41, (2, 32, 32))
    idx = np.indices((2, 32, 32))
    seg[idx[0], idx[1], idx[2], cls] = 1.0
    rgb = np.asarray(gan_shade.shading_target(seg))
    assert rgb.shape == (2, 32, 32, 3)
    assert rgb.min() >= -1.0 and rgb.max() <= 1.0
    # batched call == stacked per-image calls (vmap-consistency)
    per = np.stack([np.asarray(gan_shade.shading_target(seg[i]))
                    for i in range(2)])
    np.testing.assert_allclose(rgb, per, atol=1e-6)
    # flat constant depth -> pure distance-scaled albedo; hue ordering of
    # the class palette must survive
    flat = np.zeros((16, 16, 41), np.float32)
    flat[..., 0] = -1.0                     # nearest
    flat[..., 3] = 1.0                      # one class everywhere
    out_near = np.asarray(gan_shade.shading_target(flat))
    far = flat.copy()
    far[..., 0] = 1.0                       # farthest
    out_far = np.asarray(gan_shade.shading_target(far))
    assert out_far.mean() < out_near.mean()   # distance falloff
    expect = np.asarray(MAPPED_COLORS[2], np.float32) / 255.0
    got = (out_near[8, 8] + 1.0) / 2.0
    # same channel ordering as the palette (shade scales all channels)
    assert np.argmax(got) == np.argmax(expect)


def test_native_checkpoint_roundtrip(tmp_path):
    """make_spade_model loads a train_spade-style pickle, builds the model
    at the checkpoint's trained dims (not cfg defaults), and the loaded
    fp16->fp32 params reproduce the saved generator."""
    import pickle

    from sln_tpu.spade.generator import SPADEGenerator4

    gen = SPADEGenerator4(ngf=4, nz=8, crop_size=32)
    seg0 = jnp.zeros((1, 32, 32, 41))
    params = gen.init(jax.random.PRNGKey(0), seg0, jnp.zeros((1, 8)))[
        "params"]
    path = tmp_path / "native.ckpt"
    slim = {"g_params": jax.tree.map(
                lambda a: np.asarray(a, np.float16), params),
            "config": {"ngf": 4, "nz": 8, "crop": 32}}
    with open(path, "wb") as f:
        pickle.dump(slim, f)

    cfg = default_config()     # spade defaults are ngf=64 / crop=256
    model, loaded = gan_shade.make_spade_model(cfg, str(path))
    assert (model.ngf, model.nz, model.crop_size) == (4, 8, 32)
    leaf = jax.tree.leaves(loaded)[0]
    assert leaf.dtype == jnp.float32
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    out_ref = gen.apply({"params": params}, seg0, z)
    out_load = model.apply({"params": loaded}, seg0, z)
    np.testing.assert_allclose(np.asarray(out_load), np.asarray(out_ref),
                               atol=2e-2)


def test_default_candidate_skipped_on_dim_mismatch(tmp_path, monkeypatch,
                                                   capsys):
    """A DEFAULT-candidate checkpoint (e.g. the committed artifact) whose
    trained ngf/crop differ from the requested cfg.spade dims is skipped,
    so --spade_crop/--spade_ngf (the documented oversized-program
    fallback) are never silently overridden; only an explicit
    --spade_checkpoint may redefine the model dims."""
    import dataclasses
    import pickle

    from sln_tpu.spade.generator import SPADEGenerator4

    gen = SPADEGenerator4(ngf=4, nz=8, crop_size=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 41)),
                      jnp.zeros((1, 8)))["params"]
    path = tmp_path / "native.ckpt"
    with open(path, "wb") as f:
        pickle.dump({"g_params": jax.tree.map(
                         lambda a: np.asarray(a, np.float16), params),
                     "config": {"ngf": 4, "nz": 8, "crop": 32}}, f)

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        spade=dataclasses.replace(cfg.spade, ngf=8, crop_size=64),
        train=dataclasses.replace(cfg.train, output_dir=str(tmp_path)))
    monkeypatch.setattr(gan_shade, "default_spade_checkpoint_path",
                        lambda: str(path))
    model, _ = gan_shade.make_spade_model(cfg)     # no explicit ckpt
    out = capsys.readouterr().out
    assert "Skipping" in out and "random init" in out
    assert (model.ngf, model.crop_size) == (8, 64)

    # the same checkpoint named explicitly still wins
    model, _ = gan_shade.make_spade_model(cfg, str(path))
    assert (model.ngf, model.crop_size) == (4, 32)


def test_bf16_param_storage_is_bit_identical():
    """compute_dtype='bfloat16' stores serving weights in bf16
    (make_spade_model): module-dtype layers cast fp32 params to bf16 per
    call anyway, so pre-cast storage must change nothing but HBM traffic.
    The SE Dense layers compute in fp32 and keep fp32 params."""
    import flax

    from sln_tpu.spade.generator import SPADEGenerator4

    gen = SPADEGenerator4(ngf=4, nz=8, crop_size=32, dtype=jnp.bfloat16)
    seg = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (2, 32, 32, 41)).astype(np.float32))
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 8))
    p32 = gen.init(jax.random.PRNGKey(0), seg, z)["params"]
    assert jax.tree.leaves(p32)[0].dtype == jnp.float32

    cfg = default_config().replace(
        spade=SpadeConfig(crop_size=32, ngf=4, nz=8,
                          compute_dtype="bfloat16"))
    _, p16 = gan_shade.make_spade_model(cfg, "random")   # same init seed
    flat16 = flax.traverse_util.flatten_dict(p16)
    assert all(v.dtype == (jnp.float32 if "se" in k else jnp.bfloat16)
               for k, v in flat16.items())

    out32 = np.asarray(gen.apply({"params": p32}, seg, z))
    out16 = np.asarray(gen.apply({"params": p16}, seg, z))
    np.testing.assert_array_equal(out32, out16)


def test_colorize_sharded_matches_single_device():
    """z-sharded multi-chip colorize == single-device (8 CPU devices) —
    including when z_chunk is NOT a multiple of the data-axis size (the
    sharded path pads each chunk rather than changing the z stream)."""
    from sln_tpu.parallel import mesh as meshlib
    from sln_tpu.spade.generator import SPADEGenerator4

    model = SPADEGenerator4(ngf=8, nz=16, crop_size=64)
    seg = np.random.default_rng(0).uniform(
        0, 1, (64, 64, 41)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 41)),
                        jnp.zeros((1, 16)))["params"]
    mesh = meshlib.make_mesh(num_data=4)
    rgb_ref = gan_shade.colorize(model, params, seg, num_z=8, z_chunk=8)
    rgb_sh = gan_shade.colorize(model, params, seg, num_z=8, z_chunk=8,
                                mesh=mesh)
    np.testing.assert_allclose(rgb_sh, rgb_ref, rtol=1e-5, atol=1e-5)
    # rounding case: z_chunk=3 on a 4-wide data axis pads each chunk to 4
    # and discards the pad rows — same z stream, same images
    rgb_ref3 = gan_shade.colorize(model, params, seg, num_z=7, z_chunk=3)
    rgb_sh3 = gan_shade.colorize(model, params, seg, num_z=7, z_chunk=3,
                                 mesh=mesh)
    np.testing.assert_allclose(rgb_sh3, rgb_ref3, rtol=1e-5, atol=1e-5)


def test_colorize_uint8_transport_matches_quantized_float():
    """out_dtype='uint8' (the PNG-bound serving transport, converted on
    device to quarter the fetch) == the float path quantized to 8-bit."""
    from sln_tpu.spade.generator import SPADEGenerator4

    model = SPADEGenerator4(ngf=8, nz=16, crop_size=64)
    seg = np.random.default_rng(4).uniform(
        0, 1, (64, 64, 41)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 41)),
                        jnp.zeros((1, 16)))["params"]
    f = gan_shade.colorize(model, params, seg, num_z=4, z_chunk=4)
    u = gan_shade.colorize(model, params, seg, num_z=4, z_chunk=4,
                           out_dtype="uint8")
    assert u.dtype == np.uint8 and u.shape == f.shape
    q = np.round(np.clip(f, 0, 1) * 255.0)
    assert np.abs(u.astype(np.float64) - q).max() <= 1.0


def test_colorize_decode_matches_unfactored_forward():
    """colorize's seg_mods + decode factoring == the plain __call__
    forward for the same z stream (seg fixed per room)."""
    from sln_tpu.spade.generator import SPADEGenerator4

    model = SPADEGenerator4(ngf=8, nz=16, crop_size=64)
    seg = np.random.default_rng(5).uniform(
        0, 1, (64, 64, 41)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 41)),
                        jnp.zeros((1, 16)))["params"]
    rgb = gan_shade.colorize(model, params, seg, num_z=5, z_chunk=2,
                             seed=3)
    # reproduce the exact z stream (fixed-size chunks, fold_in counter)
    key = jax.random.PRNGKey(3)
    zs = [jax.random.normal(jax.random.fold_in(key, i), (2, 16))
          for i in range(3)]
    z = jnp.concatenate(zs)[:5]
    seg_b = jnp.broadcast_to(jnp.asarray(seg)[None], (5, 64, 64, 41))
    direct = model.apply({"params": params}, seg_b, z)
    np.testing.assert_allclose(rgb, (np.asarray(direct) + 1.0) / 2.0,
                               rtol=2e-5, atol=2e-5)
