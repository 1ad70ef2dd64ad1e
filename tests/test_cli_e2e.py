"""End-to-end smoke of the test.py CLI glue (tiny dims, CPU).

The workload functions have their own tests; this drives the reference's
actual user entry point (test.py modes, reference test.py:28-95) through
main(argv) and asserts the artifact contract: batch_gen ->
measure_acc_l1_std -> heat_map -> draw_2d -> draw_3d all write their files
into one shared --test_dir, heat_map/measure reusing batch_gen's cached
posterior exactly like the reference chain.
"""

import json
import os

import numpy as np
import pytest

import test as test_cli
# imported at collection time so a test ordering that puts
# test_loader_parity.py (which temporarily adds /root/reference, whose
# top-level train.py would shadow ours, to sys.path) first can't change
# which module this resolves to
import train as train_cli

COMMON = ["--synthetic", "16", "--max_objects", "12", "--batch_size", "8",
          "--allow_random_weights"]


@pytest.fixture(scope="module")
def test_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_e2e")
    return str(d)


def test_batch_gen_mode(test_dir, capsys):
    test_cli.main(COMMON + ["--test_dir", test_dir, "--batch_gen"])
    assert os.path.isfile(os.path.join(test_dir, "mean_cov.pkl"))
    extracted = os.path.join(test_dir, "data", "data_extracted.json")
    assert os.path.isfile(extracted)
    with open(extracted) as f:
        layouts = json.load(f)
    assert layouts, "batch_gen wrote an empty layout dump"


def test_measure_mode_prints_reference_lines(test_dir, capsys):
    test_cli.main(COMMON + ["--test_dir", test_dir,
                            "--measure_acc_l1_std"])
    out = capsys.readouterr().out
    # the reference eval's print contract (testing/test_acc_mean_std.py)
    assert "PRED, RAND, PERT L1:" in out
    assert "PRED, RAND, PERT ACC:" in out
    assert "mean pos std:" in out
    l1 = [float(x) for x in
          out.split("PRED, RAND, PERT L1:")[1].splitlines()[0].split()]
    assert all(np.isfinite(l1)) and len(l1) == 3


def test_heat_map_mode(test_dir):
    test_cli.main(COMMON + ["--test_dir", test_dir, "--heat_map",
                            "--heatmap_iters", "32"])
    heat_dir = os.path.join(test_dir, "data", "heat")
    pkls = [f for f in os.listdir(heat_dir) if f.endswith("_heat.pkl")]
    pngs = [f for f in os.listdir(heat_dir) if f.endswith(".png")]
    assert pkls and pngs


def test_draw_2d_mode(test_dir):
    test_cli.main(COMMON + ["--test_dir", test_dir, "--draw_2d"])
    demo = os.path.join(test_dir, "data", "2D_rendered", "demo.png")
    assert os.path.getsize(demo) > 0


def test_fine_tune_mode(test_dir):
    """CLI glue for --fine_tune at tiny dims (--refine_render_size 32 +
    a 16,32 pyramid keep the CPU compile small): the z_value/bbox_rot
    artifact set (reference test_render_refine.py:282-283,369-377) must
    appear under <test_dir>/data/finetune/<room>/."""
    test_cli.main(COMMON + ["--test_dir", test_dir, "--fine_tune",
                            "--refine_render_size", "32",
                            "--refine_pyramid", "16,32",
                            "--refine_iters", "2"])
    base = os.path.join(test_dir, "data", "finetune")
    rooms = os.listdir(base)
    assert rooms, "fine_tune wrote no room dirs"
    d = os.path.join(base, rooms[0])
    for f in ("z_value.pkl", "bbox_rot_0.pkl", "bbox_rot_1.pkl",
              "bbox_rot_gt.pkl"):
        assert os.path.isfile(os.path.join(d, f)), f
    # the channel-image artifacts (target + first/last iteration)
    pngs = [f for f in os.listdir(d) if f.endswith(".png")]
    assert any("target" in f for f in pngs)


def test_gan_shade_mode(test_dir):
    """CLI glue for --gan_shade at tiny dims ('random' sentinel keeps it
    hermetic; --spade_crop/--spade_ngf size the generator)."""
    test_cli.main(COMMON + ["--test_dir", test_dir, "--gan_shade",
                            "--spade_checkpoint", "random",
                            "--spade_crop", "64", "--spade_ngf", "8",
                            "--num_z", "2"])
    out = os.path.join(test_dir, "data", "SPADE_out")
    pngs = [f for f in os.listdir(out) if f.endswith("_color.png")]
    assert pngs, "gan_shade wrote no colorizations"
    # exactly --num_z colorizations per rendered room
    rooms = {f.split("_")[0] for f in pngs}
    assert len(pngs) == 2 * len(rooms), pngs


def test_train_cli_smoke_with_microbatch(tmp_path, capsys):
    """train.py glue end-to-end at tiny dims: trains a few iterations
    with --microbatch (gradient accumulation through the CLI), writes the
    checkpoint trio, and restores from it on a second invocation."""
    out = str(tmp_path / "ckpts")
    argv = ["--synthetic", "16", "--max_objects", "12",
            "--batch_size", "8", "--microbatch", "4",
            "--num_iterations", "4", "--print_every", "2",
            "--checkpoint_every", "2", "--snapshot_every", "4",
            "--output_dir", out]
    train_cli.main(argv)
    text = capsys.readouterr().out
    assert "done" in text and "[total_loss]" in text
    names = os.listdir(out)
    assert any(n.startswith("latest_checkpoint") and n.endswith(".ckpt")
               for n in names), names
    assert any("snapshot" in n for n in names), names
    assert "metrics.jsonl" in names

    train_cli.main(argv + ["--restore_from_checkpoint", "1"])
    assert "Restoring from checkpoint" in capsys.readouterr().out


def test_draw_3d_preview_mode(test_dir):
    """No blender binary in this image: --renderer preview renders the
    batch_gen layouts through the rasterizer to the Blender path's
    artifact names."""
    test_cli.main(COMMON + ["--test_dir", test_dir, "--draw_3d",
                            "--renderer", "preview"])
    out = os.path.join(test_dir, "data", "rendered")
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert pngs, "preview renderer wrote no images"
