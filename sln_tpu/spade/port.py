"""Port reference SPADE checkpoints (latest_net_G_AB.pth) to flax params.

Spectral norm is folded at port time: torch's eval-mode effective kernel is
W / sigma with sigma = u^T W_mat v from the stored power-iteration vectors
(torch.nn.utils.spectral_norm state: weight_orig / weight_u / weight_v).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def fold_spectral(sd: Mapping[str, np.ndarray], prefix: str) -> np.ndarray:
    """Effective conv kernel of a spectral_norm-wrapped torch Conv2d."""
    W = _np(sd[prefix + ".weight_orig"]).astype(np.float64)
    u = _np(sd[prefix + ".weight_u"]).astype(np.float64)
    v = _np(sd[prefix + ".weight_v"]).astype(np.float64)
    Wm = W.reshape(W.shape[0], -1)
    sigma = float(u @ (Wm @ v))
    return (W / sigma).astype(np.float32)


def conv_oihw_to_hwio(W: np.ndarray) -> np.ndarray:
    return np.transpose(W, (2, 3, 1, 0)).copy()


def _conv(sd, prefix: str, spectral: bool) -> Dict[str, np.ndarray]:
    W = fold_spectral(sd, prefix) if spectral else _np(sd[prefix +
                                                          ".weight"])
    out = {"kernel": conv_oihw_to_hwio(W)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"]).copy()
    return out


def _padconv(sd, prefix: str, spectral: bool = False) -> dict:
    return {"conv": _conv(sd, prefix, spectral)}


def _spade4(sd, prefix: str) -> dict:
    return {
        "mlp_preshared_depth": _padconv(sd, f"{prefix}.mlp_preshared_depth.1"),
        "mlp_shared": _padconv(sd, f"{prefix}.mlp_shared.1"),
        "mlp_gamma": _padconv(sd, f"{prefix}.mlp_gamma.1"),
        "mlp_beta": _padconv(sd, f"{prefix}.mlp_beta.1"),
    }


def _resblock(sd, prefix: str, fin: int, fout: int) -> dict:
    out = {
        "conv_0": {"conv": _conv(sd, f"{prefix}.conv_0.1", True)},
        "conv_1": {"conv": _conv(sd, f"{prefix}.conv_1.1", True)},
        "norm_0": _spade4(sd, f"{prefix}.norm_0"),
        "norm_1": _spade4(sd, f"{prefix}.norm_1"),
        "se": {"fc1": {"kernel": _np(sd[f"{prefix}.se.fc.0.weight"]).T
                       .copy()},
               "fc2": {"kernel": _np(sd[f"{prefix}.se.fc.2.weight"]).T
                       .copy()}},
    }
    if fin != fout:
        out["conv_s"] = _conv(sd, f"{prefix}.conv_s", True)
        out["norm_s"] = _spade4(sd, f"{prefix}.norm_s")
    return out


def port_spade_generator4(state_dict: Mapping[str, object],
                          ngf: int = 64) -> dict:
    """Full reference SPADEGenerator4 state_dict -> flax params tree."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    nf = ngf
    params = {
        "fc": {"kernel": sd["fc.weight"].T.copy(),
               "bias": sd["fc.bias"].copy()},
        "conv_img": _conv(sd, "conv_img", False),
        "head_0": _resblock(sd, "head_0", 16 * nf, 16 * nf),
        "G_middle_0": _resblock(sd, "G_middle_0", 16 * nf, 16 * nf),
        "G_middle_1": _resblock(sd, "G_middle_1", 16 * nf, 16 * nf),
        "up_0": _resblock(sd, "up_0", 16 * nf, 8 * nf),
        "up_1": _resblock(sd, "up_1", 8 * nf, 4 * nf),
        "up_2": _resblock(sd, "up_2", 4 * nf, 2 * nf),
        "up_3": _resblock(sd, "up_3", 2 * nf, 1 * nf),
    }
    return params


def load_reference_checkpoint(path: str) -> dict:
    """Load ./checkpoints/latest_net_G_AB.pth and port it."""
    import torch
    sd = torch.load(path, map_location="cpu")
    return port_spade_generator4(sd)
