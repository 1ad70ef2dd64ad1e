"""Checkpointing with the reference's artifact semantics.

Mirrors reference train.py:34-55, 93-114: a single checkpoint dict holding
model state, optimizer state, counters, and loss history, saved as three
artifacts:

* ``latest_<name>_with_model.ckpt``  every checkpoint_every steps
* ``<name>snapshot_%06dK.ckpt``      every snapshot_every steps
* ``<name>_no_model.ckpt``           weights-stripped, for cheap loss-curve
                                     inspection

Serialization is pickle over numpy-ified pytrees (the reference uses
torch.save, which is pickle too).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def new_checkpoint(config_dict: Dict[str, Any],
                   vocab: Dict[str, Any]) -> Dict[str, Any]:
    """Fresh history dict (reference train.py:34-55)."""
    return {
        "args": config_dict,
        "vocab": vocab,
        "losses_ts": [],
        "losses": {},
        "checkpoint_ts": [],
        "counters": {"t": None, "epoch": None},
        "model_state": None,
        "optim_state": None,
    }


def record_losses(ckpt: Dict[str, Any], t: int,
                  losses: Dict[str, float]) -> None:
    for name, val in losses.items():
        ckpt["losses"].setdefault(name, []).append(float(val))
    ckpt["losses_ts"].append(int(t))


def save_checkpoint(ckpt: Dict[str, Any], output_dir: str, name: str,
                    t: int, epoch: int, model_state, optim_state,
                    snapshot: bool = False) -> str:
    os.makedirs(output_dir, exist_ok=True)
    ckpt["model_state"] = _to_numpy(model_state)
    ckpt["optim_state"] = _to_numpy(optim_state)
    ckpt["counters"]["t"] = int(t)
    ckpt["counters"]["epoch"] = int(epoch)

    latest = os.path.join(output_dir, f"latest_{name}_with_model.ckpt")
    with open(latest, "wb") as f:
        pickle.dump(ckpt, f)

    if snapshot:
        snap = os.path.join(output_dir, name + "snapshot_%06dK.ckpt"
                            % (t // 1000))
        with open(snap, "wb") as f:
            pickle.dump(ckpt, f)

    small = {k: v for k, v in ckpt.items()
             if k not in ("model_state", "optim_state")}
    with open(os.path.join(output_dir, f"{name}_no_model.ckpt"), "wb") as f:
        pickle.dump(small, f)
    return latest


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_path(output_dir: str, name: str) -> str:
    return os.path.join(output_dir, f"latest_{name}_with_model.ckpt")


def reference_pt_path(output_dir: str, name: str) -> str:
    """Where a reference-trained torch checkpoint would sit
    (reference train.py:99: latest_<name>_with_model.pt)."""
    return os.path.join(output_dir, f"latest_{name}_with_model.pt")


def load_reference_checkpoint(path: str, model_cfg
                              ) -> Optional[Dict[str, Any]]:
    """Import a reference-format torch checkpoint
    (`latest_checkpoint_with_model.pt`, schema at reference train.py:34-55
    and :93-100) into sln_tpu variables.

    Returns a dict shaped like load_checkpoint's result: model_state holds
    the ported {params, batch_stats}; counters/vocab/losses pass through.
    The torch optimizer state is NOT ported (Adam moments don't transfer
    meaningfully across frameworks) — resume restarts the optimizer.
    """
    if not os.path.isfile(path):
        return None
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    from sln_tpu.utils.torch_port import port_sg2scvae

    params, stats = port_sg2scvae(ckpt["model_state"], model_cfg)
    return {
        "args": ckpt.get("args", {}),
        "vocab": ckpt.get("vocab", {}),
        "losses_ts": ckpt.get("losses_ts", []),
        "losses": dict(ckpt.get("losses", {})),
        "checkpoint_ts": ckpt.get("checkpoint_ts", []),
        "counters": ckpt.get("counters", {"t": None, "epoch": None}),
        "model_state": {"params": params, "batch_stats": stats},
        "optim_state": None,
    }
