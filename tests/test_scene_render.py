"""Scene assembly + full render stack: channel semantics, class placement,
and end-to-end differentiability w.r.t. boxes and angles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sln_tpu.config import RenderConfig, CameraConfig
from sln_tpu.data.vocab import NYU40_CLASSES, OBJECT_IDX_TO_NAME
from sln_tpu.render import assets, scene


CFG = RenderConfig(camera=CameraConfig(image_size=64))


@pytest.fixture(scope="module")
def bank():
    return scene.device_bank(assets.build_procedural_bank(subdiv=1),
                             shell_subdiv=2)


def simple_room(bank):
    """One bed + one lamp in a 4x2.7x3.5 room."""
    O = 6
    objs = np.zeros(O, np.int32)
    boxes = np.zeros((O, 6), np.float32)
    angles = np.zeros(O, np.float32)
    mask = np.zeros(O, bool)
    bed = OBJECT_IDX_TO_NAME.index("bed")
    lamp = OBJECT_IDX_TO_NAME.index("lamp")
    objs[0], objs[1], objs[2] = bed, lamp, 0
    boxes[0] = [0.2, 0.0, 0.3, 0.6, 0.25, 0.75]
    boxes[1] = [0.65, 0.0, 0.4, 0.75, 0.2, 0.5]
    boxes[2] = [0, 0, 0, 4.0, 2.7, 3.5]
    mask[:3] = True
    model_idx = assets.retrieve_models(
        jnp.asarray(objs),
        jnp.asarray(boxes * np.concatenate([boxes[2, 3:], boxes[2, 3:]])),
        assets.build_procedural_bank(subdiv=1))
    return (jnp.asarray(objs), jnp.asarray(boxes), jnp.asarray(angles),
            jnp.asarray(mask), model_idx)


def test_render_channel_shapes_and_content(bank):
    objs, boxes, angles, mask, midx = simple_room(bank)
    out = scene.render_layout(objs, boxes, angles, mask, midx, bank, CFG)
    out = np.asarray(out)
    S = CFG.camera.image_size
    assert out.shape == (1 + 40 + 29, S, S)
    depth = out[0]
    # most of the image should see the room (finite depth, not clipped)
    assert (depth > 0).mean() > 0.5
    assert np.isfinite(out).all()

    # the bed must occupy pixels in its NYU channel
    bed_ch = 1 + NYU40_CLASSES.index("bed")
    assert out[bed_ch].max() > 0.5
    assert out[bed_ch].sum() > 10
    # floor/wall visible
    assert out[1 + NYU40_CLASSES.index("floor")].max() > 0.5
    assert out[1 + NYU40_CLASSES.index("wall")].max() > 0.5
    # absent class stays empty
    assert out[1 + NYU40_CLASSES.index("toilet")].max() < 0.05


def test_depth_channels_normalized(bank):
    objs, boxes, angles, mask, midx = simple_room(bank)
    out = np.asarray(scene.render_layout(objs, boxes, angles, mask, midx,
                                         bank, CFG))
    depth_chans = out[41:]
    assert depth_chans.shape[0] == 29
    assert np.isfinite(depth_chans).all()
    # normalized by wall max -> magnitudes near [0, ~1.5]
    assert depth_chans.max() < 3.0
    assert depth_chans.min() > -0.1


def test_gradients_wrt_boxes_and_angles(bank):
    objs, boxes, angles, mask, midx = simple_room(bank)

    def loss_fn(boxes, angles):
        out = scene.render_layout(objs, boxes, angles, mask, midx, bank,
                                  CFG)
        bed_ch = 1 + NYU40_CLASSES.index("bed")
        return out[bed_ch].sum() + out[0].mean()

    g_boxes, g_angles = jax.grad(loss_fn, argnums=(0, 1))(boxes, angles)
    g_boxes, g_angles = np.asarray(g_boxes), np.asarray(g_angles)
    assert np.isfinite(g_boxes).all() and np.isfinite(g_angles).all()
    # moving the bed box must change the loss
    assert np.abs(g_boxes[0]).max() > 1e-4
    # rotating the bed must change coverage
    assert abs(g_angles[0]) > 1e-6
    # padded rows receive no gradient
    assert np.abs(g_boxes[3:]).max() == 0.0


def test_moving_object_moves_mask(bank):
    objs, boxes, angles, mask, midx = simple_room(bank)
    out1 = np.asarray(scene.render_layout(objs, boxes, angles, mask, midx,
                                          bank, CFG))
    boxes2 = np.array(boxes)
    boxes2[0, 0] += 0.25
    boxes2[0, 3] += 0.25
    out2 = np.asarray(scene.render_layout(objs, jnp.asarray(boxes2), angles,
                                          mask, midx, bank, CFG))
    bed_ch = 1 + NYU40_CLASSES.index("bed")
    # mask moved -> significant pixel difference
    assert np.abs(out1[bed_ch] - out2[bed_ch]).sum() > 5.0
