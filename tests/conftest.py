"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware."""
import os

# Force CPU: the ambient sitecustomize registers the axon TPU backend and
# sets jax_platforms="axon,cpu" PROGRAMMATICALLY (env vars are overridden),
# so we must update the jax config after import, before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pointcloudsegmentation_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Eager flax init dispatches thousands of tiny CPU ops one at a time and
# dominated the suite wall-time (measured: 42 s eager vs 1.3 s trace +
# 8.3 s compile for the flagship at 512 points).  Route every Module.init
# through jit, marking python scalars (train flags, dims) static — the
# same thing train.loop.Trainer.init_state does in the product.
import flax.linen as _nn  # noqa: E402

_raw_init = _nn.Module.init


def _jitted_init(self, rngs, *args, **kwargs):
    from functools import partial

    static = tuple(i + 1 for i, a in enumerate(args)
                   if a is None or isinstance(a, (bool, int, float, str)))
    return jax.jit(partial(_raw_init, self, **kwargs),
                   static_argnums=static)(rngs, *args)


_nn.Module.init = _jitted_init

_raw_apply = _nn.Module.apply


def _jitted_apply(self, variables, *args, **kwargs):
    from functools import partial

    # only the plain forward path is jitted; anything exotic (mutable
    # collections, intermediate capture, custom method) stays eager
    if set(kwargs) - {"rngs", "train"}:
        return _raw_apply(self, variables, *args, **kwargs)
    static = tuple(i + 1 for i, a in enumerate(args)
                   if a is None or isinstance(a, (bool, int, float, str)))
    return jax.jit(partial(_raw_apply, self, **kwargs),
                   static_argnums=static)(variables, *args)


_nn.Module.apply = _jitted_apply

# Heavy full-Trainer compile tests are opt-in: the default suite stays
# CI-fast; set PCS_RUN_SLOW=1 (or run scripts/run_slow_tests.sh) to
# include them.
slow = pytest.mark.skipif(not os.environ.get("PCS_RUN_SLOW"),
                          reason="slow compile; set PCS_RUN_SLOW=1")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy end-to-end compile (opt-in via "
                   "PCS_RUN_SLOW=1)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("PCS_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow compile; set PCS_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _reset_compute_dtype():
    """The compute-dtype policy is process-global (set by Trainer); reset it
    so float32-exact tests aren't affected by bf16 trainers running first."""
    from pointcloudsegmentation_tpu.models.layers import set_compute_dtype
    set_compute_dtype(None)
    yield
    set_compute_dtype(None)
