"""Quantify the culling headroom of the refine-bench scene (host side).

Computes, for the REAL bench refinement scene at 256px:
  - current scheme: 512-px row tiles, y-sorted face chunks, y-overlap
    culling -> active (tile, chunk) density
  - hypothetical 2-D scheme: (8 x 128)-px tiles, faces sorted by
    (y-band, x-center), chunks culled by BOTH row and column bbox overlap
    -> density

The densities bound the kernel speedup available from 2-D tiling: kernel
time ~ active chunk-tile pairs (the per-pair VPU work is unchanged).

Run on CPU: python tools/analyze_tile_culling.py
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses as dc

import jax.numpy as jnp
import numpy as np


def main():
    from sln_tpu.config import DataConfig, default_config
    from sln_tpu.render import assets, camera as cam_lib, scene as scene_lib
    from sln_tpu.render.rasterizer import face_geometry
    from sln_tpu.render.rasterizer_pallas import (CULL_HALO_PX, FC, PT,
                                                  chunk_tile_mask)
    from sln_tpu.workloads import refine
    from bench import _refine_batch

    S = 256
    cfg = default_config().replace(
        data=DataConfig(max_objects=16, max_triples=48, max_on_rels=16))
    cfg = cfg.replace(refine=dc.replace(cfg.refine, render_size=S))
    batch = _refine_batch(cfg, 1, synthetic_seed=3)
    bank_host = assets.build_procedural_bank(cfg.render.mesh_subdiv)
    bank = scene_lib.device_bank(bank_host, cfg.render.shell_subdiv)
    rcfg = dc.replace(cfg.render, camera=dc.replace(
        cfg.render.camera, image_size=S))
    midx, target, size_t, room_row = refine.prepare_refine_inputs(
        batch, bank_host, bank, rcfg)

    # rebuild the scene geometry exactly as render_layout does, with the
    # GT boxes (the refine loop's decoded boxes stay near these)
    objs = batch.objs[0]
    boxes = batch.boxes[0]
    angles = batch.angles[0].astype(jnp.float32)
    scene = scene_lib.assemble_scene(objs, boxes, angles, batch.obj_mask[0],
                                     midx[0], bank, 0)
    room_mask = (objs == 0) & batch.obj_mask[0]
    room_dims = jnp.einsum("o,od->d", room_mask.astype(boxes.dtype),
                           boxes)[3:]
    cam = cam_lib.camera_from_room(room_dims, rcfg.camera)
    vcam = cam_lib.to_camera(scene.verts, cam)
    v2d_all, z_all = cam_lib.project(vcam, cam)
    tri_v2d = np.asarray(v2d_all[scene.faces])
    tri_z = np.asarray(z_all[scene.faces])
    culled = (tri_z < rcfg.camera.cull_eps).any(-1)
    valid = np.asarray(scene.face_valid) & ~culled
    geom = face_geometry(jnp.asarray(tri_v2d), jnp.asarray(tri_z),
                         jnp.asarray(valid), scene.face_class,
                         near=rcfg.camera.near)

    F = tri_v2d.shape[0]
    print(f"faces total={F} valid={int(valid.sum())}")

    # --- current: y-sorted chunks, row tiles ---
    mask = np.asarray(chunk_tile_mask(geom, S))
    print(f"current 1-D: tiles={mask.shape[0]} chunks={mask.shape[1]} "
          f"density={mask.mean():.3f} "
          f"active-pairs={int(mask.sum())}")

    # --- hypothetical 2-D: sort by (y-band, x), (8 x 128) tiles ---
    v2d = tri_v2d
    xs = np.where(valid[:, None], v2d[..., 0], np.nan)
    ys = np.where(valid[:, None], v2d[..., 1], np.nan)
    ycen = np.where(valid, np.nanmean(ys, -1), np.inf)
    xcen = np.where(valid, np.nanmean(xs, -1), np.inf)
    band = 32.0
    order = np.lexsort((xcen, np.floor(ycen / band)))
    xmin = np.where(valid, np.nanmin(xs, -1), np.inf)[order]
    xmax = np.where(valid, np.nanmax(xs, -1), -np.inf)[order]
    ymin = np.where(valid, np.nanmin(ys, -1), np.inf)[order]
    ymax = np.where(valid, np.nanmax(ys, -1), -np.inf)[order]
    Fp = ((F + FC - 1) // FC) * FC
    pad = Fp - F
    if pad:
        xmin = np.concatenate([xmin, np.full(pad, np.inf)])
        xmax = np.concatenate([xmax, np.full(pad, -np.inf)])
        ymin = np.concatenate([ymin, np.full(pad, np.inf)])
        ymax = np.concatenate([ymax, np.full(pad, -np.inf)])
    K = Fp // FC
    cxmin = xmin.reshape(K, FC).min(1) - CULL_HALO_PX
    cxmax = xmax.reshape(K, FC).max(1) + CULL_HALO_PX
    cymin = ymin.reshape(K, FC).min(1) - CULL_HALO_PX
    cymax = ymax.reshape(K, FC).max(1) + CULL_HALO_PX

    for th, tw in ((8, 128), (16, 128), (8, 256), (32, 256)):
        nty, ntx = S // th, S // tw
        act = 0
        for ti in range(nty):
            r0, r1 = ti * th, ti * th + th - 1
            for tj in range(ntx):
                c0, c1 = tj * tw, tj * tw + tw - 1
                ok = ((cymin <= r1) & (cymax >= r0)
                      & (cxmin <= c1) & (cxmax >= c0))
                act += int(ok.sum())
        total = nty * ntx * K
        # normalize cost to the 1-D scheme's tile count: pairs *
        # (pixels/tile) is the real work unit
        work = act * th * tw
        work_1d = int(mask.sum()) * PT
        print(f"2-D {th}x{tw}: tiles={nty * ntx} density={act / total:.3f} "
              f"active-pairs={act} rel-work={work / work_1d:.2f}")


if __name__ == "__main__":
    main()
