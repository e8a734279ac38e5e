"""Device-side compute core: pure JAX ops, runnable unchanged on CPU and TPU.

This is the analog of the reference's `kernels/` crate: one pure
compute path with two execution backends (reference: kernels/src/lib.rs:21
is a single function called from both SPIR-V and the CPU driver). Here
the same property holds via JAX: every op is traceable and jit-compiles
for TPU or CPU without modification.
"""
