#!/usr/bin/env python
"""Controlled refinement-value sweep on the shipped bench checkpoint.

VERDICT r3 flagged that refine_iou_delta is ~+0.001 at the reference
hyperparameters (test_render_refine.py:286: lr_z=2e-4 nesterov 0.1, 60
iters) while older notes claimed a 12-13% render-loss cut. This sweep
answers, on the committed artifacts/latest_bench_with_model.ckpt and the
bench's exact protocol (sigma-perturbed GT-encoded z, synthetic_seed=11):

  (a) can ANY (lr_z, iters) recover decoded-layout IoU meaningfully
      (>= +0.01), and
  (b) what do the reference hyperparameters actually deliver.

Each row runs tools/eval_refinement_quality.py in-process (same jit cache,
one TPU process). Writes artifacts/refine_sweep.json.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_probe(**kw):
    from tools import eval_refinement_quality as probe

    argv = ["--output_dir", os.path.join(REPO, "artifacts"),
            "--checkpoint_name", "bench"]
    for k, v in kw.items():
        argv += [f"--{k}", str(v)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.main(argv)
    line = [l for l in buf.getvalue().splitlines()
            if l.startswith("{")][-1]
    rec = json.loads(line)
    rec.update(kw)
    return rec


def main():
    rows = []
    grid = [
        # the reference hyperparameters (lr_z=0 -> RefineConfig 2e-4)
        dict(sigma=1.0, num_iters=60),
        # z learning-rate ladder at the reference budget
        dict(sigma=1.0, num_iters=60, lr_z=2e-3),
        dict(sigma=1.0, num_iters=60, lr_z=2e-2),
        dict(sigma=1.0, num_iters=60, lr_z=1e-1),
        # longer budgets at the two most promising rates
        dict(sigma=1.0, num_iters=240, lr_z=2e-2),
        dict(sigma=1.0, num_iters=240, lr_z=1e-1),
        # perturbation-size sensitivity at the best rate
        dict(sigma=0.5, num_iters=60, lr_z=2e-2),
        dict(sigma=2.0, num_iters=60, lr_z=2e-2),
    ]
    for kw in grid:
        rec = run_probe(rooms=8, **kw)
        rec["iou_delta"] = round(rec["iou_refined"] - rec["iou_perturbed"],
                                 4)
        rec["loss_cut_pct"] = round(
            100.0 * (1.0 - rec["loss_last"] / rec["loss_first"]), 2)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.path.join(REPO, "artifacts", "refine_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("saved", out)


if __name__ == "__main__":
    main()
