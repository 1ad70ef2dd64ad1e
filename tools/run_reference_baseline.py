#!/usr/bin/env python
"""Head-to-head oracle baseline: train the torch reference on the SAME
synthetic data this repo's committed bench checkpoint was trained on, then
run the reference's own eval (testing/test_acc_mean_std.py) so BASELINE.md
can publish a measured reference acc/L1/std next to sln_tpu's numbers.

The reference code at /root/reference is imported READ-ONLY as an oracle
(the sanctioned pattern, tests/conftest.py); nothing is copied. Because the
reference hardcodes CUDA (train.py:14, test_acc_mean_std.py:11) and this
image has CPU-only torch, `.cuda()`/`torch.cuda.FloatTensor` are patched to
identity before calling its unmodified entry points. The reference also
loads `metadata/{valid_types,size_info_many,30_size_info_many}.json` by
relative path (data/suncg_dataset.py:30,84-87) and ships no metadata/ dir,
so a staging directory is fabricated from this repo's vocab + the same
synthetic size table the sln_tpu pipeline uses (data/synthetic.py
default_size_table) and used as cwd.

Data parity with bench.py `_load_bench_model`:
  train = generate_rooms(4096, seed=42), val = generate_rooms(512, seed=7),
  equal iteration budget (default 6000, the committed artifact's budget)
  and equal batch size (128, both repos' training default).

Usage:
  python tools/run_reference_baseline.py                 # full run
  python tools/run_reference_baseline.py --iters 50 --train_rooms 64  # smoke
  python tools/run_reference_baseline.py --skip_train    # eval only
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


class GuardedArgs(argparse.Namespace):
    """Namespace whose test_dir survives the reference eval's hardcoded
    overwrite (test_acc_mean_std.py:25,85 assigns the author's cluster
    path before reading mean_cov_public.pkl)."""

    @property
    def test_dir(self):
        return self._test_dir

    @test_dir.setter
    def test_dir(self, value):
        pass  # ignore the hardcoded author path


def stage_data(stage: str, train_rooms: int, val_rooms: int) -> None:
    import numpy as np

    from sln_tpu.data.synthetic import default_size_table, generate_rooms
    from sln_tpu.data.vocab import OBJECT_IDX_TO_NAME

    os.makedirs(os.path.join(stage, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(stage, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(stage, "layouts_out", "data"), exist_ok=True)

    for name, n, seed in (("train", train_rooms, 42), ("val", val_rooms, 7)):
        path = os.path.join(stage, f"data_rot_{name}.json")
        if os.path.isfile(path):
            # a previous run (e.g. the docstring's smoke command) may have
            # staged a DIFFERENT room count; silently reusing it would train
            # the baseline on the wrong dataset while results.json records
            # the requested one — regenerate unless the count matches
            with open(path) as f:
                if len(json.load(f)) == n:
                    continue
            print(f"| restaging {path}: existing room count != {n}",
                  flush=True)
        with open(path, "w") as f:
            json.dump(generate_rooms(n, seed=seed), f)

    # vocab order parity: prepending '__room__' (suncg_dataset.py:31)
    # reproduces sln_tpu's OBJECT_IDX_TO_NAME exactly
    with open(os.path.join(stage, "metadata", "valid_types.json"), "w") as f:
        json.dump(list(OBJECT_IDX_TO_NAME[1:]), f)

    table, median, avail = default_size_table()
    size_many = {}    # {type: [[_, height_med], volume_med]} (:245,:253)
    size_30 = {}      # {type: {height_3/7, volume_3/7}} (:270-281)
    for i, name in enumerate(OBJECT_IDX_TO_NAME):
        if not bool(avail[i]):
            continue
        h3, h7, v3, v7 = (float(x) for x in table[i])
        hm, vm = (float(x) for x in median[i])
        size_many[name] = [[hm, hm], vm]
        size_30[name] = {"height_3": h3, "height_7": h7,
                         "volume_3": v3, "volume_7": v7}
    with open(os.path.join(stage, "metadata", "size_info_many.json"),
              "w") as f:
        json.dump(size_many, f)
    with open(os.path.join(stage, "metadata", "30_size_info_many.json"),
              "w") as f:
        json.dump(size_30, f)


def patch_cpu_torch() -> None:
    """No-op the CUDA moves so the unmodified reference runs on CPU torch."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor

    # torch >= 2.6 defaults weights_only=True, which rejects the
    # reference's defaultdict-bearing checkpoints (train.py:34-55); the
    # files are produced by this very run, so full unpickling is safe
    _load = torch.load
    torch.load = lambda *a, **k: _load(*a,
                                       **{"weights_only": False, **k})


def stub_shapely() -> None:
    """shapely isn't in this image; the reference eval imports it at module
    scope (testing/test_utils.py:1) but the acc/L1/std path never calls it
    (only get_iou_cuboid does). Provide an import-satisfying stub."""
    import types

    if "shapely" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("shapely stub: get_iou_cuboid not supported here")

    shapely = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")
    polygon = types.ModuleType("shapely.geometry.polygon")
    polygon.Polygon = _unavailable
    geometry.polygon = polygon
    shapely.geometry = geometry
    sys.modules["shapely"] = shapely
    sys.modules["shapely.geometry"] = geometry
    sys.modules["shapely.geometry.polygon"] = polygon


def reference_args(stage: str, iters: int, batch_size: int,
                   num_workers: int = 2, resume: bool = False) -> GuardedArgs:
    sys.argv = [
        "train.py",
        "--loader_num_workers", str(num_workers),
        "--suncg_train_dir", os.path.join(stage, "data_rot_train.json"),
        "--suncg_val_dir", os.path.join(stage, "data_rot_val.json"),
        "--output_dir", os.path.join(stage, "checkpoints"),
        "--test_dir", os.path.join(stage, "layouts_out"),
        "--num_iterations", str(iters),
        "--batch_size", str(batch_size),
        # frequent checkpoints + 1k-iter snapshots: an 8h CPU run must
        # survive crashes (restore_from_checkpoint reads
        # '<name>_with_model.pt', train.py:17-26) and leave budget-matched
        # snapshots for eval even if it never reaches --iters
        "--checkpoint_every", str(min(200, iters)),
        "--snapshot_every", str(min(1000, iters)),
    ]
    if resume:
        sys.argv += ["--restore_from_checkpoint", "1"]  # bool_flag: 0/1
    from options.options import Options

    opt = Options().parse()
    guarded = GuardedArgs(**{k: v for k, v in vars(opt).items()
                             if k != "test_dir"})
    object.__setattr__(guarded, "_test_dir", opt.test_dir)
    return guarded


def parse_eval_output(text: str) -> dict:
    out = {}
    m = re.search(r"PRED, RAND, PERT L1: ([\d.eE+-]+) ([\d.eE+-]+) "
                  r"([\d.eE+-]+)", text)
    if m:
        out["l1_pred"], out["l1_rand"], out["l1_pert"] = map(float,
                                                             m.groups())
    m = re.search(r"PRED, RAND, PERT ACC: +([\d.eE+-]+) ([\d.eE+-]+) "
                  r"([\d.eE+-]+)", text)
    if m:
        out["acc_pred"], out["acc_rand"], out["acc_pert"] = map(float,
                                                                m.groups())
    for key, pat in (("std_angle", r"mean angle std: ([\d.eE+-]+)"),
                     ("std_pos", r"mean pos std: ([\d.eE+-]+)"),
                     ("std_size", r"mean sizes std: ([\d.eE+-]+)")):
        m = re.search(pat, text)
        if m:
            out[key] = float(m.group(1))
    return out


def run_captured(fn, *args):
    """Run fn while teeing stdout (the reference evals print, not return)."""
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    with contextlib.redirect_stdout(Tee()):
        fn(*args)
    return buf.getvalue()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage",
                    default=os.path.join(REPO, "artifacts", "ref_baseline"))
    ap.add_argument("--iters", type=int, default=6000)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--train_rooms", type=int, default=4096)
    ap.add_argument("--val_rooms", type=int, default=512)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_eval", action="store_true",
                    help="train/time only; no batch_gen or acc/std eval")
    ap.add_argument("--num_workers", type=int, default=2,
                    help="DataLoader workers (this image has 1 core; the "
                         "reference default of 8 just contends)")
    ap.add_argument("--torch_threads", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="restore from the latest checkpoint (crash "
                         "recovery for the multi-hour CPU run)")
    args = ap.parse_args(argv)

    stage = os.path.abspath(args.stage)
    stage_data(stage, args.train_rooms, args.val_rooms)

    import numpy as np
    import torch

    if args.torch_threads:
        torch.set_num_threads(args.torch_threads)
    patch_cpu_torch()
    stub_shapely()

    sys.path.insert(0, REFERENCE)
    os.chdir(stage)
    ref_args = reference_args(stage, args.iters, args.batch_size,
                              args.num_workers, resume=args.resume)

    import train as ref_train            # /root/reference/train.py
    from testing import test_VAE
    from testing import test_acc_mean_std

    def bridge_checkpoint_names():
        # the reference trainer writes 'latest_<name>_with_model.pt'
        # (train.py:98) but both its restore path (train.py:18) and its
        # evals (test_VAE.py:21, test_acc_mean_std.py:16) read
        # '<name>_with_model.pt'
        saved = os.path.join(
            ref_args.output_dir,
            f"latest_{ref_args.checkpoint_name}_with_model.pt")
        expected = os.path.join(
            ref_args.output_dir,
            f"{ref_args.checkpoint_name}_with_model.pt")
        if os.path.isfile(saved) and (
                not os.path.isfile(expected)
                or os.path.getmtime(saved) > os.path.getmtime(expected)):
            shutil.copyfile(saved, expected)
        return expected

    train_seconds = None
    if not args.skip_train:
        if args.resume:
            bridge_checkpoint_names()
        print(f"=== training reference for {args.iters} iters "
              f"(batch {args.batch_size}, CPU) ===", flush=True)
        t0 = time.perf_counter()
        ref_train.main(ref_args)
        train_seconds = time.perf_counter() - t0
        print(f"=== reference training took {train_seconds:.1f}s "
              f"({args.iters * args.batch_size / train_seconds:.1f} "
              f"scenes/s) ===", flush=True)

    expected = bridge_checkpoint_names()

    if args.skip_eval:
        return

    # posterior mean/cov via the reference's own batch_gen pass
    # (test_VAE.py:32-62); its eval expects the file under the name
    # mean_cov_public.pkl (test_acc_mean_std.py:26)
    test_dir = ref_args.test_dir
    mean_cov = os.path.join(test_dir, "mean_cov.pkl")
    public = os.path.join(test_dir, "mean_cov_public.pkl")
    # test_VAE caches mean_cov.pkl (test_VAE.py:33); invalidate the cache
    # when the checkpoint is newer so re-evals see the current weights
    if (os.path.isfile(mean_cov) and os.path.isfile(expected)
            and os.path.getmtime(expected) > os.path.getmtime(mean_cov)):
        os.remove(mean_cov)
    np.random.seed(0)
    test_VAE.get_layouts_from_network(ref_args)
    shutil.copyfile(mean_cov, public)

    np.random.seed(0)
    acc_text = run_captured(test_acc_mean_std.get_acc_l1, ref_args)
    np.random.seed(0)
    std_text = run_captured(test_acc_mean_std.get_std, ref_args)

    results = parse_eval_output(acc_text + "\n" + std_text)
    results["iters"] = args.iters
    results["train_seconds"] = train_seconds
    results["batch_size"] = args.batch_size
    results["train_rooms"] = args.train_rooms
    results["val_rooms"] = args.val_rooms
    out_path = os.path.join(stage, "results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("\n=== reference baseline results ===")
    print(json.dumps(results, indent=1))
    print("saved", out_path)


if __name__ == "__main__":
    main()
