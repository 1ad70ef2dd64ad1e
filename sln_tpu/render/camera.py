"""Projection camera for the differentiable renderer.

Reproduces the reference's hand-built camera (models/diff_render.py:13-46):
fixed pitch, camera at the room's mid-x on the near wall, slightly above
mid-height; world -> OpenCV camera coordinates (x right, y down, z forward)
via the cam2cv flip diag(1, -1, -1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from sln_tpu.config import CameraConfig


class Camera(NamedTuple):
    rot: jnp.ndarray      # (3, 3) world -> cv rotation
    trans: jnp.ndarray    # (3,) world -> cv translation
    focal: jnp.ndarray    # () focal length in pixels at `image_size`
    center: jnp.ndarray   # () principal point (image_size / 2)
    image_size: int


def camera_from_room(room_dims: jnp.ndarray,
                     cfg: CameraConfig = CameraConfig()) -> Camera:
    """room_dims: (3,) [X, Y, Z] extents of the room box."""
    theta = cfg.pitch
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot_w2cam = jnp.array([[1.0, 0.0, 0.0],
                           [0.0, c, s],
                           [0.0, -s, c]], jnp.float32)
    X, Y, Z = room_dims[0], room_dims[1], room_dims[2]
    cam_pos = jnp.stack([
        X / 2.0,
        Y / 2.0 + jnp.minimum(cfg.height_offset_cap, jnp.abs(Y / 2.0)),
        Z,
    ])
    t_w2cam = rot_w2cam @ (-cam_pos)
    flip = jnp.array([[1.0, 0.0, 0.0],
                      [0.0, -1.0, 0.0],
                      [0.0, 0.0, -1.0]], jnp.float32)
    rot = flip @ rot_w2cam
    trans = flip @ t_w2cam
    focal = jnp.float32(cfg.focal_pix * cfg.image_size / cfg.sensor_size)
    center = jnp.float32(cfg.image_size / 2.0)
    return Camera(rot=rot, trans=trans, focal=focal, center=center,
                  image_size=cfg.image_size)


def to_camera(verts: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """(V, 3) world -> cv camera coordinates (z is viewing depth)."""
    return verts @ cam.rot.T + cam.trans


def project(verts_cam: jnp.ndarray, cam: Camera,
            eps: float = 1e-6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(V, 3) camera coords -> ((V, 2) pixel coords [col, row], (V,) depth)."""
    z = verts_cam[..., 2]
    zc = jnp.maximum(z, eps)
    u = cam.focal * verts_cam[..., 0] / zc + cam.center
    v = cam.focal * verts_cam[..., 1] / zc + cam.center
    return jnp.stack([u, v], axis=-1), z
