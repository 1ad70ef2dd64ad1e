"""Reference-CLI compatibility flags.

The reference declares a number of flags (options/options.py:18-69) that
its own code never consumes, or that are CUDA/DataLoader specifics with no
TPU counterpart. Accepting them keeps every reference invocation a valid
invocation here (drop-in CLI parity) without pretending they do anything:

- declared-but-unused in the reference (SURVEY.md 5.6): ``--gconv_dim``,
  ``--gconv_hidden_dim`` (the model hardcodes hidden = 4 x embedding_dim,
  Sg2ScVAE_model.py:19-20), ``--timing``, ``--vec_noise_dim``,
  ``--layout_noise_dim``, ``--checkpoint_start_from``.
- CUDA / host-loader specifics: ``--gpu_id`` (single-CUDA-device pick;
  device selection here is the jax platform + mesh), ``--loader_num_workers``
  (torch DataLoader workers; the data pipeline here is pre-tensorized +
  on-device augmentation), ``--multigpu`` (the reference asserts False on
  it, build_dataset_model.py:54-55; multi-device here is first-class via
  ``--num_data_shards`` / the mesh, so the flag is simply accepted).
- ``--suncg_data_dir``: the SUNCG asset root the reference exports as an
  env var at import time (options/options.py:7-8) for the Blender/mesh
  paths; the asset pipeline here takes explicit dirs
  (tools/build_asset_bank.py), so this is accepted and exported the same
  way for any user scripts that read SUNCG_DIR.
"""

from __future__ import annotations

import argparse
import os


def bool_flag(s: str) -> bool:
    """The reference's 0/1 bool parser (utils.py:106-112)."""
    if str(s).lower() in ("1", "true"):
        return True
    if str(s).lower() in ("0", "false"):
        return False
    raise argparse.ArgumentTypeError(f"invalid bool flag {s!r}")


def add_reference_compat_flags(p: argparse.ArgumentParser) -> None:
    """Accept the reference flags that have no TPU-side behavior."""
    g = p.add_argument_group(
        "reference compatibility (accepted; no-ops here — see "
        "sln_tpu/utils/cli.py for why each one has no TPU counterpart)")
    g.add_argument("--suncg_data_dir", default=os.environ.get("SUNCG_DIR",
                                                              ""))
    g.add_argument("--loader_num_workers", default=8, type=int)
    g.add_argument("--gconv_dim", default=128, type=int)
    g.add_argument("--gconv_hidden_dim", default=512, type=int)
    g.add_argument("--vec_noise_dim", default=0, type=int)
    g.add_argument("--layout_noise_dim", default=32, type=int)
    g.add_argument("--timing", default=False, type=bool_flag)
    g.add_argument("--multigpu", default=False, type=bool_flag)
    g.add_argument("--checkpoint_start_from", default=None)
    g.add_argument("--gpu_id", default=0, type=int)


def apply_reference_compat_flags(args: argparse.Namespace) -> None:
    """Side effects the reference ties to these flags, minus CUDA."""
    if getattr(args, "suncg_data_dir", ""):
        # reference options/options.py:7-8 exports this at import time
        os.environ["SUNCG_DIR"] = args.suncg_data_dir
