"""Numerical parity of the padded JAX Sg2ScVAE against the reference
PyTorch model (run read-only as an oracle, weights ported with
sln_tpu.utils.torch_port)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_tpu.config import ModelConfig
from sln_tpu.data.batch import make_scene_batch
from sln_tpu.data.vocab import VOCAB
from sln_tpu.models.graph import GraphTripleConv
from sln_tpu.models.vae import Sg2ScVAE
from sln_tpu.ops.relations import compute_rel_host_idx
from sln_tpu.utils import torch_port


def make_ragged_scenes(rng, sizes, num_classes=31, t_per_scene=None):
    """Random scenes: returns per-scene (objs, boxes, angles, attrs, triples).

    Each scene has sizes[i]-1 real objects + a room node last; triples are
    one in_room edge per object plus a few oracle-labeled random pairs.
    """
    scenes = []
    for n in sizes:
        objs = rng.integers(1, num_classes + 1, size=n).astype(np.int64)
        objs[-1] = 0  # room
        lo = rng.uniform(0, 0.6, size=(n, 3))
        size = rng.uniform(0.05, 0.4, size=(n, 3))
        boxes = np.concatenate([lo, lo + size], 1).astype(np.float32)
        boxes[-1] = [0, 0, 0, 4.0, 2.7, 3.5]
        angles = rng.integers(0, 24, size=n).astype(np.int64)
        angles[-1] = 0
        attrs = rng.integers(0, 5, size=n).astype(np.int64)
        attrs[-1] = 0
        triples = []
        for i in range(n - 1):
            triples.append([i, 0, n - 1])
        for _ in range(t_per_scene or n):
            i, j = rng.choice(n - 1, size=2, replace=False)
            p = compute_rel_host_idx(boxes[i] * np.tile(boxes[-1][3:], 2),
                                     boxes[j] * np.tile(boxes[-1][3:], 2))
            triples.append([i, p, j])
        scenes.append((objs, boxes, angles, attrs,
                       np.array(triples, np.int64)))
    return scenes


def pad_scenes(scenes, O, T):
    B = len(scenes)
    objs = np.zeros((B, O), np.int32)
    boxes = np.zeros((B, O, 6), np.float32)
    angles = np.zeros((B, O), np.int32)
    attrs = np.zeros((B, O), np.int32)
    mask = np.zeros((B, O), bool)
    triples = np.zeros((B, T, 3), np.int32)
    tmask = np.zeros((B, T), bool)
    for b, (o, bx, an, at, tr) in enumerate(scenes):
        n, t = len(o), len(tr)
        objs[b, :n] = o
        boxes[b, :n] = bx
        angles[b, :n] = an
        attrs[b, :n] = at
        mask[b, :n] = True
        triples[b, :t] = tr
        tmask[b, :t] = True
    return make_scene_batch(objs, boxes, angles, attrs, mask, triples, tmask)


def flatten_scenes(scenes):
    """Reference-style flattened batch (suncg_collate_fn semantics)."""
    import torch
    objs, boxes, angles, attrs, triples = [], [], [], [], []
    offset = 0
    for o, bx, an, at, tr in scenes:
        objs.append(o)
        boxes.append(bx)
        angles.append(an)
        attrs.append(at)
        tr = tr.copy()
        tr[:, 0] += offset
        tr[:, 2] += offset
        triples.append(tr)
        offset += len(o)
    return (torch.from_numpy(np.concatenate(objs)),
            torch.from_numpy(np.concatenate(boxes)),
            torch.from_numpy(np.concatenate(angles)),
            torch.from_numpy(np.concatenate(attrs)),
            torch.from_numpy(np.concatenate(triples)))


@pytest.mark.parametrize("mlp_norm", ["none", "batch"])
def test_graph_triple_conv_parity(reference_modules, mlp_norm):
    import torch
    ref_graph = reference_modules["graph"]
    torch.manual_seed(0)
    D, H = 16, 32
    ref = ref_graph.GraphTripleConv(input_dim=D, hidden_dim=H,
                                    mlp_normalization=mlp_norm)
    ref.train()

    rng = np.random.default_rng(0)
    sizes = [5, 8]
    O_max, T_max = 10, 20
    # raw node/edge features
    n_total = sum(sizes)
    obj_vecs_list = [rng.standard_normal((n, D)).astype(np.float32)
                     for n in sizes]
    t_counts = [7, 11]
    edges_list, pred_list = [], []
    for n, t in zip(sizes, t_counts):
        e = rng.integers(0, n, size=(t, 2))
        edges_list.append(e)
        pred_list.append(rng.standard_normal((t, D)).astype(np.float32))

    # --- reference forward on the flattened graph
    offset = 0
    flat_edges = []
    for n, e in zip(sizes, edges_list):
        flat_edges.append(e + offset)
        offset += n
    tv_obj = torch.from_numpy(np.concatenate(obj_vecs_list))
    tv_pred = torch.from_numpy(np.concatenate(pred_list))
    tv_edges = torch.from_numpy(np.concatenate(flat_edges)).long()
    with torch.no_grad():
        ref_obj, ref_pred = ref(tv_obj, tv_pred, tv_edges)

    # --- ours on the padded batch with ported weights
    sd = torch_port.state_dict_to_numpy(ref.state_dict())
    p1, s1 = torch_port.port_mlp(sd, "net1", 2, mlp_norm, False)
    p2, s2 = torch_port.port_mlp(sd, "net2", 2, mlp_norm, False)
    params = {"net1": p1, "net2": p2}
    stats = {k: v for k, v in (("net1", s1), ("net2", s2)) if v}

    B = len(sizes)
    obj_vecs = np.zeros((B, O_max, D), np.float32)
    pred_vecs = np.zeros((B, T_max, D), np.float32)
    edges = np.zeros((B, T_max, 2), np.int32)
    obj_mask = np.zeros((B, O_max), bool)
    t_mask = np.zeros((B, T_max), bool)
    for b in range(B):
        n, t = sizes[b], t_counts[b]
        obj_vecs[b, :n] = obj_vecs_list[b]
        pred_vecs[b, :t] = pred_list[b]
        edges[b, :t] = edges_list[b]
        obj_mask[b, :n] = True
        t_mask[b, :t] = True

    model = GraphTripleConv(input_dim=D, hidden_dim=H,
                            mlp_normalization=mlp_norm)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    (out_obj, out_pred), _ = model.apply(
        variables, jnp.asarray(obj_vecs), jnp.asarray(pred_vecs),
        jnp.asarray(edges), jnp.asarray(obj_mask), jnp.asarray(t_mask),
        True, mutable=["batch_stats"])

    out_obj, out_pred = np.asarray(out_obj), np.asarray(out_pred)

    # compare valid rows
    ref_obj = ref_obj.numpy()
    ref_pred = ref_pred.numpy()
    off_o = off_t = 0
    for b in range(B):
        n, t = sizes[b], t_counts[b]
        np.testing.assert_allclose(out_obj[b, :n], ref_obj[off_o:off_o + n],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(out_pred[b, :t], ref_pred[off_t:off_t + t],
                                   rtol=2e-4, atol=2e-5)
        off_o += n
        off_t += t


@pytest.mark.parametrize("train_mode", [True, False])
def test_sg2scvae_parity(reference_modules, train_mode):
    import torch
    ref_vae_mod = reference_modules["vae"]
    torch.manual_seed(1)
    cfg = ModelConfig()
    ref = ref_vae_mod.Sg2ScVAEModel(
        vocab=VOCAB.to_dict(), embedding_dim=cfg.embedding_dim,
        decoder_cat=cfg.decoder_cat, gconv_num_layers=cfg.gconv_num_layers,
        mlp_normalization=cfg.mlp_normalization, use_attr=cfg.use_attr)
    ref.train() if train_mode else ref.eval()

    rng = np.random.default_rng(2)
    scenes = make_ragged_scenes(rng, [5, 9, 7])
    t_objs, t_boxes, t_angles, t_attrs, t_triples = flatten_scenes(scenes)
    with torch.no_grad():
        ref_mu, ref_logvar = ref.encoder(t_objs, t_triples, t_boxes,
                                         t_angles, t_attrs)
        z = torch.randn(t_objs.shape[0], cfg.latent_dim)
        ref_boxes, ref_angles = ref.decoder(z, t_objs, t_triples, t_attrs)

    params, stats = torch_port.port_sg2scvae(ref.state_dict(), cfg)
    model = Sg2ScVAE(cfg)
    variables = {"params": params, "batch_stats": stats}

    batch = pad_scenes(scenes, O=12, T=24)
    (mu, logvar), _ = model.apply(variables, batch, train_mode,
                                  method=Sg2ScVAE.encode,
                                  mutable=["batch_stats"])

    # pack z into padded layout
    sizes = [len(s[0]) for s in scenes]
    z_np = z.numpy()
    z_pad = np.zeros((len(sizes), 12, cfg.latent_dim), np.float32)
    off = 0
    for b, n in enumerate(sizes):
        z_pad[b, :n] = z_np[off:off + n]
        off += n
    (boxes_pred, angle_logprobs), _ = model.apply(
        variables, jnp.asarray(z_pad), batch, train_mode,
        method=Sg2ScVAE.decode, mutable=["batch_stats"])

    mu, logvar = np.asarray(mu), np.asarray(logvar)
    boxes_pred = np.asarray(boxes_pred)
    angle_logprobs = np.asarray(angle_logprobs)
    off = 0
    for b, n in enumerate(sizes):
        np.testing.assert_allclose(mu[b, :n], ref_mu.numpy()[off:off + n],
                                   rtol=5e-4, atol=2e-4)
        np.testing.assert_allclose(logvar[b, :n],
                                   ref_logvar.numpy()[off:off + n],
                                   rtol=5e-4, atol=2e-4)
        np.testing.assert_allclose(boxes_pred[b, :n],
                                   ref_boxes.numpy()[off:off + n],
                                   rtol=5e-4, atol=2e-4)
        np.testing.assert_allclose(angle_logprobs[b, :n],
                                   ref_angles.numpy()[off:off + n],
                                   rtol=5e-4, atol=5e-4)
        off += n
