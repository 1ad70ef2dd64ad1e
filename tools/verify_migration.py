#!/usr/bin/env python
"""Migration proof on GENUINELY TRAINED reference weights.

MIGRATION.md claims a reference-trained `latest_<name>_with_model.pt` is a
drop-in for sln_tpu (checkpoint.load_reference_checkpoint). The layer-wise
port is oracle-tested, but this tool closes the end-to-end loop: it takes a
torch checkpoint that tools/run_reference_baseline.py actually TRAINED
(reference train.py:93-100 format), imports it through the same
common.restore_model path users hit (testing/test_VAE.py:21-26 restore
pattern), runs sln_tpu's own acc/L1/std eval on the SAME staged val rooms
with the REFERENCE's own mean_cov.pkl posterior, and compares against the
reference's own eval numbers (results.json from the baseline runner).

Usage:
  python tools/run_reference_baseline.py --iters 200      # train + eval
  python tools/verify_migration.py                        # compare
  python tools/verify_migration.py --stage <dir> --tol_acc 0.03

Writes <stage>/migration.json and exits non-zero if any metric disagrees
beyond tolerance. Sampling noise: both evals draw z ~ N(mean, cov) with
their own rng streams, so equality is statistical — tolerances default to
what 512 rooms x 4 samples supports (acc +-0.02, L1 +-0.01).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage",
                    default=os.path.join(REPO, "artifacts", "ref_baseline"))
    ap.add_argument("--results", default="results.json",
                    help="torch eval results file within --stage (e.g. "
                         "results_migration_200.json for a smoke-trained "
                         "checkpoint)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. while the TPU is "
                         "held by another process)")
    ap.add_argument("--tol_acc", type=float, default=0.02)
    ap.add_argument("--tol_l1", type=float, default=0.01)
    args = ap.parse_args(argv)
    stage = os.path.abspath(args.stage)

    results_path = os.path.join(stage, args.results)
    val_json = os.path.join(stage, "data_rot_val.json")
    mean_cov_pkl = os.path.join(stage, "layouts_out", "mean_cov.pkl")
    for p in (results_path, val_json, mean_cov_pkl):
        if not os.path.isfile(p):
            raise SystemExit(
                f"missing {p} — run tools/run_reference_baseline.py first")
    with open(results_path) as f:
        ref = json.load(f)

    import pickle

    import jax

    if args.cpu:
        # the axon plugin ignores JAX_PLATFORMS; the config knob works
        jax.config.update("jax_platforms", "cpu")
    # parity vs torch accumulates in reduced precision otherwise
    jax.config.update("jax_default_matmul_precision", "highest")

    from sln_tpu.config import TrainConfig, default_config
    from sln_tpu.data import tensorize
    from sln_tpu.workloads import acc_l1_std, common

    cfg = default_config().replace(
        train=TrainConfig(output_dir=os.path.join(stage, "checkpoints"),
                          checkpoint_name="checkpoint"))

    # the reference's own posterior cache ([mean, cov] pickle,
    # test_VAE.py:56-61) — both evals must sample the same z distribution
    with open(mean_cov_pkl, "rb") as f:
        mean, cov = pickle.load(f)
    mean, cov = np.asarray(mean, np.float32), np.asarray(cov, np.float32)

    # import the TRAINED torch checkpoint via the drop-in path (no native
    # .ckpt exists under the stage, so restore_model takes the .pt branch)
    model, variables = common.restore_model(cfg, example_batch=None)
    trained_t = None
    try:
        import torch
        pt = torch.load(os.path.join(stage, "checkpoints",
                                     "latest_checkpoint_with_model.pt"),
                        map_location="cpu", weights_only=False)
        trained_t = pt.get("counters", {}).get("t")
    except Exception:
        pass

    val_arrays = tensorize.tensorize_file(val_json, cfg.data.max_objects)
    _, size_info = common.load_arrays(8, cfg)

    res = acc_l1_std.run_acc_l1(model, variables, val_arrays, size_info,
                                cfg, mean, cov, batch_size=256)
    std = acc_l1_std.run_std(model, variables, val_arrays, size_info, cfg,
                             mean, cov, nsample=10, batch_size=256)

    rows = [
        ("acc_pred", ref.get("acc_pred"), res["acc_pred"], args.tol_acc),
        ("l1_pred", ref.get("l1_pred"), res["l1_pred"], args.tol_l1),
        ("acc_rand", ref.get("acc_rand"), res["acc_rand"], 0.05),
        ("l1_rand", ref.get("l1_rand"), res["l1_rand"], 0.05),
    ]
    report = {"stage": stage, "trained_iters": trained_t,
              "torch_eval": {k: ref.get(k) for k, _, _, _ in rows},
              "sln_tpu_eval_on_imported_pt": {
                  "acc_pred": res["acc_pred"], "l1_pred": res["l1_pred"],
                  "acc_rand": res["acc_rand"], "l1_rand": res["l1_rand"],
                  "std_pos": std["std_pos"], "std_angle": std["std_angle"],
                  "std_size": std["std_size"]},
              "deltas": {}, "ok": True}
    print(f"\n=== migration check (trained {trained_t} iters) ===")
    print(f"{'metric':10} {'torch':>9} {'sln_tpu':>9} {'delta':>8} tol")
    for name, rv, ov, tol in rows:
        if rv is None:
            continue
        d = abs(ov - rv)
        ok = d <= tol
        report["deltas"][name] = round(ov - rv, 5)
        report["ok"] = report["ok"] and ok
        print(f"{name:10} {rv:9.4f} {ov:9.4f} {ov - rv:+8.4f} "
              f"{tol:.3g} {'ok' if ok else 'MISMATCH'}")
    if not report["deltas"]:
        # a partial/empty reference results.json (e.g. the baseline run
        # crashed mid-eval) must not produce a vacuous MIGRATION OK
        report["ok"] = False
        report["error"] = ("reference eval has no comparable metrics "
                           f"(keys: {sorted(ref)})")
        print("no comparable metrics in the reference results:",
              sorted(ref))
    # std on the torch side, if the baseline eval recorded it
    for k in ("std_pos", "std_angle", "std_size"):
        if k in ref:
            print(f"{k:10} {ref[k]:9.4f} {std[k]:9.4f} "
                  f"{std[k] - ref[k]:+8.4f} (informational)")

    out = os.path.join(stage, "migration.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(("MIGRATION OK" if report["ok"] else "MIGRATION MISMATCH"),
          "->", out)
    if not report["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
