"""Convert PyTorch state_dicts (reference checkpoints) to sln_tpu params.

Used (a) by parity tests that run the reference modules as numerical
oracles, and (b) to import real trained checkpoints
(`latest_checkpoint_with_model.pt`, `latest_net_G_AB.pth`) into the JAX
models. Only numpy views of the tensors are consumed here — no torch
dependency at call sites that already have a {key: ndarray} dict.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


Array = np.ndarray
Params = Dict[str, dict]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def state_dict_to_numpy(state_dict: Mapping[str, object]) -> Dict[str, Array]:
    return {k: _np(v) for k, v in state_dict.items()}


def port_linear(sd: Mapping[str, Array], prefix: str) -> dict:
    """torch nn.Linear -> flax nn.Dense (kernel transposed)."""
    out = {"kernel": sd[prefix + ".weight"].T.copy()}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"].copy()
    return out


def port_embedding(sd: Mapping[str, Array], prefix: str) -> dict:
    return {"embedding": sd[prefix + ".weight"].copy()}


def port_batchnorm(sd: Mapping[str, Array], prefix: str
                   ) -> Tuple[dict, dict]:
    """torch BatchNorm1d -> (params, batch_stats) for MaskedBatchNorm."""
    params = {"scale": sd[prefix + ".weight"].copy(),
              "bias": sd[prefix + ".bias"].copy()}
    stats = {"mean": sd[prefix + ".running_mean"].copy(),
             "var": sd[prefix + ".running_var"].copy()}
    return params, stats


def port_mlp(sd: Mapping[str, Array], prefix: str, num_stages: int,
             batch_norm: str, final_plain: bool) -> Tuple[dict, dict]:
    """Port a reference `make_mlp` Sequential into sln_tpu.models.layers.MLP.

    The reference Sequential layout (models/graph.py:10-27):
      batch_norm='batch':  stage i -> Linear@3i, BN@3i+1, ReLU@3i+2
      batch_norm='none':   stage i -> Linear@2i, ReLU@2i+1
    `norelu` strips the trailing activation (and BN), leaving the last
    Linear at its stage index.
    """
    params: dict = {}
    stats: dict = {}
    step = 3 if batch_norm == "batch" else 2
    for i in range(num_stages):
        lin_idx = step * i
        params[f"dense_{i}"] = port_linear(sd, f"{prefix}.{lin_idx}")
        is_last = i == num_stages - 1
        if batch_norm == "batch" and not (is_last and final_plain):
            p, s = port_batchnorm(sd, f"{prefix}.{lin_idx + 1}")
            params[f"bn_{i}"] = p
            stats[f"bn_{i}"] = s
    return params, stats


def port_graph_triple_conv(sd: Mapping[str, Array], prefix: str,
                           batch_norm: str) -> Tuple[dict, dict]:
    """Reference GraphTripleConv (net1/net2) -> sln_tpu GraphTripleConv."""
    params, stats = {}, {}
    p1, s1 = port_mlp(sd, f"{prefix}.net1", 2, batch_norm, False)
    p2, s2 = port_mlp(sd, f"{prefix}.net2", 2, batch_norm, False)
    params["net1"], params["net2"] = p1, p2
    if s1:
        stats["net1"] = s1
    if s2:
        stats["net2"] = s2
    return params, stats


def port_gconv_net(sd: Mapping[str, Array], prefix: str, num_layers: int,
                   mode: str, batch_norm: str) -> Tuple[dict, dict]:
    params, stats = {}, {}
    if mode == "recurrent":
        p, s = port_graph_triple_conv(sd, f"{prefix}.gconvs.0", batch_norm)
        params["gconv_shared"] = p
        if s:
            stats["gconv_shared"] = s
    else:
        for i in range(num_layers):
            p, s = port_graph_triple_conv(sd, f"{prefix}.gconvs.{i}",
                                          batch_norm)
            params[f"gconv_{i}"] = p
            if s:
                stats[f"gconv_{i}"] = s
    return params, stats


def port_sg2scvae(sd: Mapping[str, Array], cfg) -> Tuple[dict, dict]:
    """Full reference Sg2ScVAEModel state_dict -> (params, batch_stats).

    Key layout per reference models/Sg2ScVAE_model.py:44-113.
    """
    sd = {k: _np(v) for k, v in sd.items()}
    bn = cfg.mlp_normalization
    params: dict = {}
    stats: dict = {}

    for name in ("obj_embeddings_ec", "pred_embeddings_ec",
                 "obj_embeddings_dc", "pred_embeddings_dc",
                 "attr_embedding_ec", "attr_embedding_dc",
                 "angle_embeddings"):
        if name + ".weight" in sd:
            params[name] = port_embedding(sd, name)
    params["box_embeddings"] = port_linear(sd, "box_embeddings")

    def mlp(name: str, num_stages: int, final_plain: bool):
        p, s = port_mlp(sd, name, num_stages, bn, final_plain)
        params[name] = p
        if s:
            stats[name] = s

    mlp("box_mean_var", 2, False)
    mlp("box_mean", 1, True)
    mlp("box_var", 1, True)
    mlp("angle_mean_var", 2, False)
    mlp("angle_mean", 1, True)
    mlp("angle_var", 1, True)
    mlp("box_net", 2, True)
    mlp("angle_net", 2, True)

    for net in ("gconv_net_ec", "gconv_net_dc"):
        p, s = port_gconv_net(sd, net, cfg.gconv_num_layers, cfg.gconv_mode,
                              bn)
        params[net] = p
        if s:
            stats[net] = s
    return params, stats
