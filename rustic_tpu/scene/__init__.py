"""Host-side scene pipeline: GLB loading, BVH build, texture atlas,
light-pick table — the analog of the reference's asset layer
(reference: src/asset.rs, src/bvh.rs, src/atlas.rs, src/light_pick.rs).

Everything here is one-time preprocessing in NumPy (with an optional
C++ fast path for the BVH builder); the output is a bundle of flat
SoA arrays uploaded once to device HBM.
"""
