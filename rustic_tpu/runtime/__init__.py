"""Render drivers: synchronous renderer, progressive tracing state,
checkpointing, denoising — the analog of the reference's driver layer
(reference: src/trace.rs).
"""
