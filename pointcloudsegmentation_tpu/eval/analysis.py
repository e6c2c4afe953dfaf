"""Activation analysis & clustering for interpretability.

Rebuilds the reference analysis tooling (SURVEY.md §2.9):

- ``capture_activations`` — run a model with flax's intermediate capture,
  returning the named per-layer outputs (the reference dumps its ``ops``
  dict tensors, analysis.py / analysis_2.py / conv_analysis.py).
- ``activation_stats`` — per-tensor histograms/moments (the matplotlib
  histogram dumps of analysis.py).
- ``cluster_activations`` — k-means over an intermediate feature map and
  color-coded cluster dumps (cluster_layer.py:6-238), using a plain numpy
  k-means (no sklearn dependency).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def capture_activations(model, params, *args, **kwargs) -> Tuple:
    """Forward pass returning (output, {path: activation}) using flax's
    capture_intermediates."""
    out, state = model.apply(params, *args, capture_intermediates=True,
                             mutable=["intermediates"], **kwargs)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:  # tuple of captured values
            flat[prefix] = np.asarray(node[0]) if isinstance(node, tuple) \
                else np.asarray(node)

    walk("", state["intermediates"])
    return out, flat


def activation_stats(acts: Dict[str, np.ndarray],
                     mask: Optional[np.ndarray] = None) -> Dict[str, Dict]:
    stats = {}
    for name, a in acts.items():
        a = np.asarray(a, np.float32)
        if mask is not None and a.ndim >= 1 and a.shape[0] == len(mask):
            a = a[mask]
        if a.size == 0:
            continue
        stats[name] = {
            "shape": list(np.asarray(a).shape),
            "mean": float(a.mean()), "std": float(a.std()),
            "min": float(a.min()), "max": float(a.max()),
            "frac_zero": float((a == 0).mean()),
        }
    return stats


def kmeans(x: np.ndarray, k: int, iters: int = 50,
           seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), k, replace=False)]
    assign = np.zeros(len(x), np.int32)
    for _ in range(iters):
        d2 = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
        new = d2.argmin(1).astype(np.int32)
        if (new == assign).all():
            break
        assign = new
        for c in range(k):
            sel = x[assign == c]
            if len(sel):
                centers[c] = sel.mean(0)
    return assign


def cluster_activations(acts: Dict[str, np.ndarray], layer: str, k: int = 8,
                        mask: Optional[np.ndarray] = None,
                        xyz: Optional[np.ndarray] = None,
                        dump_path: Optional[str] = None) -> np.ndarray:
    """K-means over one layer's per-point activations; optionally dump a
    cluster-colored cloud (cluster_layer.py's workflow)."""
    a = np.asarray(acts[layer], np.float32)
    valid = np.ones(len(a), bool) if mask is None else np.asarray(mask)
    assign = np.zeros(len(a), np.int32)
    assign[valid] = kmeans(a[valid], k)
    if dump_path and xyz is not None:
        from ..utils import viz
        viz.output_labeled_points(dump_path, np.asarray(xyz)[valid],
                                  assign[valid], num_classes=k)
    return assign
