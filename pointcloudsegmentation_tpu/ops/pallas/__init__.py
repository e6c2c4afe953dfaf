"""Pallas TPU kernels for the hot compute paths."""
from .conv_pool import project_max  # noqa: F401
