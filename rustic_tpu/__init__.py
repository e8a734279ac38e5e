"""rustic_tpu — a TPU-native wavefront path-tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
pema99/rust-path-tracer ("rustic"): a physically-based, progressive path
tracer with PBR materials, next-event estimation with MIS, texture
atlasing, procedural & HDR skyboxes, and BVH-accelerated ray traversal.

Architecture (TPU-first, not a port):

- The reference runs one divergent megakernel per pixel
  (reference: kernels/src/lib.rs:21). We instead run a *wavefront*
  integrator over a flat SoA batch of paths, advanced bounce-by-bounce
  with masked lanes (rustic_tpu/ops/trace.py).
- Ray/triangle intersection is reformulated as one fused matmul on the
  MXU ("flash intersection", rustic_tpu/ops/intersect.py) with an
  online min-reduction over triangle tiles; a vectorized BVH traversal
  (lax.while_loop over per-lane short stacks) covers large scenes.
- Scene preprocessing (GLB load, binned-SAH BVH, texture atlas, alias
  light table) is host-side NumPy/C++ (rustic_tpu/scene/).
- Multi-chip scaling is data-parallel over paths via shard_map on a
  jax.sharding.Mesh (rustic_tpu/parallel/).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the integrator's compiled program is
# large (unrolled bounce pipeline); caching makes every process after the
# first start in seconds instead of minutes (notably bench runs).
_cache_dir = _os.environ.get(
    "RUSTIC_TPU_XLA_CACHE", _os.path.expanduser("~/.cache/rustic_tpu_xla")
)
if _cache_dir and _cache_dir != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # Seed the cache from a repo-shipped snapshot — the analog of the
    # reference shipping precompiled SPIR-V kernels with the app
    # (reference: kernels are built at crate build time, not first
    # launch). A first-contact cold compile costs minutes over the axon
    # tunnel; the snapshot carries the headline bench/CLI executables
    # for the jax/libtpu image this repo pins. Entries are copied only
    # if absent; a key miss (different jax version, different HLO) just
    # falls back to a normal compile.
    _seed = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "assets", "xla_cache_seed",
    )
    if (
        _os.path.isdir(_seed)
        and _os.environ.get("RUSTIC_TPU_XLA_SEED", "1") == "1"
    ):
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            import shutil as _shutil

            for _f in _os.listdir(_seed):
                _dst = _os.path.join(_cache_dir, _f)
                if _f.endswith("-cache") and not _os.path.exists(_dst):
                    _shutil.copyfile(_os.path.join(_seed, _f), _dst)
        except Exception:
            pass

# Honor $JAX_PLATFORMS even when a site hook (e.g. the axon TPU plugin's
# sitecustomize) programmatically overrode the platform list before this
# package imported: the config value wins over the env var, so mirror
# the env var back into the config. Without this, JAX_PLATFORMS=cpu runs
# hang in the TPU plugin's connect-retry loop when the tunnel is down.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from rustic_tpu.config import (  # noqa: F401
    NextEventEstimation,
    RenderSettings,
    TracingConfig,
    Tonemapping,
)
