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

# Persistent compilation cache: compiles over the remote-TPU tunnel are
# slow (tens of seconds to tens of MINUTES for the big scan programs);
# caching them across processes makes every CLI / workload start fast.
# The default lives under the HOME cache dir, NOT /tmp: /tmp is wiped on
# reboot, and a wiped cache turns a bench run into a string of cold
# multi-minute compiles (the BENCH_r04 timeout). Disable with
# SLN_TPU_COMPILATION_CACHE=0.
import os as _os

if _os.environ.get("SLN_TPU_COMPILATION_CACHE", "1") != "0":
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "jax_sln"))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:  # very old jax or read-only fs: not fatal
        pass
