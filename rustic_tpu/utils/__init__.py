"""Utilities: image IO, profiling counters."""
