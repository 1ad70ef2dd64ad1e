"""sln_tpu — a TPU-native (JAX / XLA / Pallas / pjit) scene-layout framework.

A from-scratch rebuild of the capabilities of aluo-x/3D_SLN ("End-to-End
Optimization of Scene Layout", CVPR 2020) designed TPU-first:

* static-shape padded scene-graph batches instead of ragged Python graphs
  (reference: data/suncg_dataset.py collate at :295-337),
* graph message passing via gather + segment_sum on the MXU/VPU
  (reference: models/graph.py:57-111 scatter_add),
* a differentiable rasterizer in JAX + Pallas replacing the Neural Mesh
  Renderer CUDA extension (reference: models/diff_render.py),
* SPADE shading generator as fused XLA convolutions
  (reference: models/SPADE_related.py),
* data/tensor parallelism through jax.sharding Mesh + pjit/shard_map
  (the reference is single-GPU only: build_dataset_model.py:54-55).

The package name is the importable spelling of "3d_sln_tpu".
"""

__version__ = "0.1.0"
