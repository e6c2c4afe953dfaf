"""Multi-host DP plumbing (parallel.distributed) on the 8-device CPU mesh.

The reference has no multi-node story (SURVEY §2.10); this is the
beyond-reference DCN path: jax.distributed bootstrap + global-mesh batch
assembly.  Single-process here — make_array_from_process_local_data is the
same call a pod uses, with this process contributing every shard.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.data import toy
from pointcloudsegmentation_tpu.parallel import make_mesh
from pointcloudsegmentation_tpu.parallel.distributed import (
    global_mesh, initialize, local_batch_to_global)


def test_initialize_noop_single_process():
    # single-process: must not try to bootstrap a coordinator
    initialize()
    initialize(num_processes=1, process_id=0)
    assert len(jax.devices()) == 8


def test_global_mesh_spans_all_devices():
    mesh = global_mesh()
    assert mesh.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_local_batch_to_global_values_and_sharding():
    mesh = global_mesh()
    batch = next(toy.toy_batches(1, batch_size=8, num_points=128,
                                 kind="room", num_classes=13, feat_dim=12))
    g = local_batch_to_global(batch, mesh)
    for k, v in batch.items():
        gv = g[k]
        assert gv.shape == v.shape
        # every device holds one batch row; values round-trip exactly
        assert len(gv.sharding.device_set) == mesh.size
        np.testing.assert_array_equal(np.asarray(gv), v)
        shard_rows = {s.index[0].start if s.index[0].start is not None
                      else 0 for s in gv.addressable_shards}
        assert len(shard_rows) == mesh.size


def test_train_step_matches_through_global_assembly():
    """A DP train step fed the globally-assembled batch must equal the
    step fed the plain host batch (assembly is layout, not math)."""
    from pointcloudsegmentation_tpu.train import Trainer, s3dis_config

    mesh = make_mesh()
    cfg = s3dis_config(model="tiny_s3dis", data_num_points=256,
                       data_caps=(128, 32), optim_epoch_steps=10)
    tr = Trainer(cfg, mesh=mesh, search_chunk=128)
    rng = jax.random.PRNGKey(0)
    batch = next(toy.toy_batches(1, batch_size=8, num_points=256,
                                 kind="room", num_classes=13, feat_dim=12))
    # train_step donates the state buffers — use two identical inits
    state1 = tr.init_state(rng, batch)
    state2 = tr.init_state(rng, batch)
    _, m_plain = tr.train_step(state1, batch, rng)
    _, m_glob = tr.train_step(state2, local_batch_to_global(batch, mesh),
                              rng)
    assert float(m_plain["loss"]) == float(m_glob["loss"])
