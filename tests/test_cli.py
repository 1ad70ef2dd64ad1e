"""CLI drop-in parity: every reference flag must parse.

The reference exposes one global argparse namespace
(options/options.py:18-69) shared by train.py and test.py; any flag
combination valid there must be a valid invocation here (unused ones are
accepted no-ops, sln_tpu/utils/cli.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import test as test_cli
import train as train_cli

# every flag the reference's Options declares, with its default-ish value
REFERENCE_FLAGS = [
    "--dataset", "suncg",
    "--suncg_train_dir", "metadata/data_rot_train.json",
    "--suncg_val_dir", "metadata/data_rot_val.json",
    "--suncg_data_dir", "/tmp/suncg",
    "--loader_num_workers", "8",
    "--embedding_dim", "64",
    "--gconv_mode", "feedforward",
    "--gconv_dim", "128",
    "--gconv_hidden_dim", "512",
    "--gconv_num_layers", "5",
    "--mlp_normalization", "batch",
    "--vec_noise_dim", "0",
    "--layout_noise_dim", "32",
    "--batch_size", "128",
    "--num_iterations", "600000",
    "--eval_mode_after", "-1",
    "--learning_rate", "1e-4",
    "--print_every", "100",
    "--checkpoint_every", "1000",
    "--snapshot_every", "10000",
    "--output_dir", "./checkpoints",
    "--checkpoint_name", "latest_checkpoint",
    "--timing", "0",
    "--multigpu", "0",
    "--restore_from_checkpoint", "0",
    "--checkpoint_start_from", "x",
    "--test_dir", "./layouts_out",
    "--gpu_id", "0",
    "--KL_loss_weight", "0.1",
    "--use_AE", "0",
    "--decoder_cat", "1",
    "--train_3d", "1",
    "--KL_linear_decay", "0",
    "--use_attr_30", "1",
    "--manual_seed", "42",
]

TEST_MODES = ["--batch_gen", "--measure_acc_l1_std", "--heat_map",
              "--draw_2d", "--draw_3d", "--fine_tune", "--gan_shade"]


def test_train_cli_accepts_all_reference_flags():
    args = train_cli.parse_args(REFERENCE_FLAGS)
    assert args.batch_size == 128
    assert args.embedding_dim == 64
    assert os.environ.get("SUNCG_DIR") == "/tmp/suncg"


def test_test_cli_accepts_all_reference_flags_and_modes():
    for mode in TEST_MODES:
        args = test_cli.parse_args(REFERENCE_FLAGS + [mode,
                                                      "--blender_path", "b"])
        assert getattr(args, mode.lstrip("-")) is True


def test_train_microbatch_flows_into_config():
    args = train_cli.parse_args(["--batch_size", "1024",
                                 "--microbatch", "256"])
    cfg = train_cli.config_from_args(args)
    assert cfg.train.microbatch == 256
    assert cfg.train.batch_size == 1024
    # and off by default
    cfg0 = train_cli.config_from_args(train_cli.parse_args([]))
    assert cfg0.train.microbatch == 0


def test_model_flags_flow_into_config():
    args = test_cli.parse_args(["--embedding_dim", "32",
                                "--gconv_num_layers", "3",
                                "--use_attr_30", "0",
                                "--use_AE", "1"])
    cfg = test_cli.build_cfg(args)
    assert cfg.model.embedding_dim == 32
    assert cfg.model.gconv_num_layers == 3
    assert cfg.model.use_ae is True
    assert cfg.data.use_attr_30 is False
