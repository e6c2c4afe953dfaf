"""Pallas TPU kernels for the windowed gather pair (see window_gather.py
for why they are opt-in: the XLA einsum form measured faster in-graph)."""
from .window_gather import dslab_bwd, gather_fwd  # noqa: F401
