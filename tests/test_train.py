"""End-to-end training smoke tests: loss decreases on synthetic data, LR
schedule matches the reference's staircase decay, metrics are sane, and the
data-parallel step runs on an 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from pointcloudsegmentation_tpu.data import toy
from pointcloudsegmentation_tpu.parallel import make_mesh
from pointcloudsegmentation_tpu.train import (Trainer, make_lr_schedule,
                                              s3dis_config)


def tiny_cfg(**kw):
    # tiny_s3dis: 2-stage miniature of the flagship (same machinery) —
    # full-spec compiles take minutes on CPU and are covered by the
    # slow-marked convergence regression
    kw.setdefault("model", "tiny_s3dis")
    return s3dis_config(
        data_num_points=512, data_caps=(256, 64),
        optim_epoch_steps=10, **kw)


def test_lr_schedule_staircase():
    cfg = tiny_cfg()
    sched = make_lr_schedule(cfg)
    steps = cfg.optim.decay_epoch * cfg.optim.epoch_steps
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(steps - 1)) == pytest.approx(1e-3)   # staircase holds
    assert float(sched(steps)) == pytest.approx(5e-4)
    assert float(sched(steps * 100)) == pytest.approx(1e-5)  # floor (lr_clip)


def test_seg_loss_excludes_corrupt_labels():
    """Labels outside [0, C) are excluded from loss and the valid mask,
    not silently clamped toward class C-1 (VERDICT r1 weak#9)."""
    import jax.numpy as jnp
    from pointcloudsegmentation_tpu.train.loop import seg_loss

    logits = jnp.zeros((2, 4, 3))
    labels = jnp.asarray([[0, 1, 2, 7], [2, -1, 1, 0]])
    mask = jnp.ones((2, 4), bool)
    loss, labels_eff, valid = seg_loss(logits, labels, mask, None, None)
    assert np.asarray(valid).tolist() == [[True, True, True, False],
                                          [True, False, True, True]]
    # uniform logits: loss is exactly log(3) over the 6 valid points
    assert float(loss) == pytest.approx(np.log(3.0), rel=1e-5)


def test_loss_decreases_on_toy_data():
    cfg = tiny_cfg()
    trainer = Trainer(cfg, search_chunk=256)
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(8, batch_size=2, num_points=512,
                                   kind="room", num_classes=13, feat_dim=12))
    state = trainer.init_state(rng, batches[0])
    losses = []
    for epoch in range(6):
        for b in batches:
            state, m = trainer.train_step(state, b, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_accum_step_matches_full_batch():
    """The per-block gradient-accumulation path (the single-chip default,
    loop._accum_train_step) is EXACTLY the batch loss: the CE weights are
    params-independent, so grad(sum S_b / sum W_b) = sum grad S_b / sum W_b.
    Loss/cm/counts must match the full-batch path; params stay close after
    one Adam step (Adam normalizes by |grad|, so near-zero-gradient
    elements amplify reduction-order noise — compare the update direction
    on the meaningful scale, not elementwise ratios)."""
    import os

    import jax.numpy as jnp

    cfg = tiny_cfg(compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    batch = next(toy.toy_batches(1, batch_size=2, num_points=512,
                                 kind="room", num_classes=13, feat_dim=12))

    tr_a = Trainer(cfg, search_chunk=256)
    sa = tr_a.init_state(rng, batch)
    assert tr_a._use_accum(sa, batch, jax.random.split(rng, 2))
    sa2, ma = tr_a.train_step(sa, batch, rng)

    os.environ["PCS_NO_ACCUM"] = "1"
    try:
        tr_b = Trainer(cfg, search_chunk=256)
        sb = tr_b.init_state(rng, batch)
        assert not tr_b._use_accum(sb, batch, jax.random.split(rng, 2))
        sb2, mb = tr_b.train_step(sb, batch, rng)
    finally:
        os.environ.pop("PCS_NO_ACCUM", None)

    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-4)
    assert np.array_equal(np.asarray(ma["cm"]), np.asarray(mb["cm"]))
    assert int(ma["correct"]) == int(mb["correct"])
    assert int(ma["count"]) == int(mb["count"])
    # one Adam step moves every param by ~lr; the two paths' updates must
    # agree except where the gradient itself is reduction-order noise
    lr = cfg.optim.lr_init
    for x, y in zip(jax.tree_util.tree_leaves(sa2.params),
                    jax.tree_util.tree_leaves(sb2.params)):
        d = float(jnp.max(jnp.abs(x - y)))
        assert d <= 2.1 * lr, d   # opposite-sign updates cap at 2*lr


def test_eval_metrics_shape():
    cfg = tiny_cfg()
    trainer = Trainer(cfg, search_chunk=256)
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(2, batch_size=2, num_points=512,
                                   kind="room"))
    state = trainer.init_state(rng, batches[0])
    state, res = trainer.run_epoch(state, batches, rng, train=False)
    assert res["iou"].shape == (13,)
    assert 0.0 <= res["miou"] <= 1.0
    assert res["points_per_sec"] > 0


def test_data_parallel_mesh_step():
    """The same trainer on an 8-device mesh: batch sharded over 'data',
    params replicated, gradients all-reduced inside the compiled step."""
    mesh = make_mesh()
    assert mesh.size == 8
    cfg = tiny_cfg()
    trainer = Trainer(cfg, mesh=mesh, search_chunk=256)
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(2, batch_size=8, num_points=512,
                                   kind="room"))
    state = trainer.init_state(rng, batches[0])
    state, m = trainer.train_step(state, batches[0], rng)
    assert np.isfinite(float(m["loss"]))
    # params stay replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8

    # single-device reference step produces the same loss (same math)
    trainer1 = Trainer(cfg, mesh=None, search_chunk=256)
    state1 = trainer1.init_state(rng, batches[0])
    _, m1 = trainer1.train_step(state1, batches[0], rng)
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]),
                               rtol=1e-4)


def test_mesh_accum_composes_with_data_parallel():
    """batch_per_device > 1 on the mesh: each device scans its local
    blocks (grad accumulation) inside shard_map, one psum reduces — must
    equal accumulating all blocks on a single chip (same per-block rngs,
    same exact-sum gradient; loop._mesh_accum_train_step)."""
    mesh = make_mesh()
    cfg = tiny_cfg(compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    batch = next(toy.toy_batches(1, batch_size=16, num_points=512,
                                 kind="room", num_classes=13, feat_dim=12))

    tr_m = Trainer(cfg, mesh=mesh, search_chunk=256)
    sm = tr_m.init_state(rng, batch)
    assert tr_m._use_mesh_accum(sm, batch, jax.random.split(rng, 16))
    sm2, mm = tr_m.train_step(sm, batch, rng)

    tr_s = Trainer(cfg, search_chunk=256)
    ss = tr_s.init_state(rng, batch)
    ss2, ms = tr_s.train_step(ss, batch, rng)

    assert float(mm["loss"]) == pytest.approx(float(ms["loss"]), rel=1e-4)
    assert np.array_equal(np.asarray(mm["cm"]), np.asarray(ms["cm"]))
    assert int(mm["correct"]) == int(ms["correct"])
    assert int(mm["count"]) == int(ms["count"])
    # params stay replicated and the two updates agree (see
    # test_accum_step_matches_full_batch for the 2*lr bound rationale)
    leaf = jax.tree_util.tree_leaves(sm2.params)[0]
    assert len(leaf.sharding.device_set) == 8
    lr = cfg.optim.lr_init
    for x, y in zip(jax.tree_util.tree_leaves(sm2.params),
                    jax.tree_util.tree_leaves(ss2.params)):
        d = float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        assert d <= 2.1 * lr, d


def test_mesh_vs_single_chip_convergence():
    """Short-training equivalence between the 8-device mesh path and the
    single-chip accumulation path (VERDICT r3 item 4): exact equality is
    impossible (BASELINE.md chaotic-numerics note — differently-fused
    programs diverge through 13 stacked neighbor maxes), but the loss
    TRAJECTORIES must track each other."""
    steps = 12
    cfg = tiny_cfg(compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(steps, batch_size=8, num_points=512,
                                   kind="room", num_classes=13,
                                   feat_dim=12, seed=3))

    def run(mesh):
        tr = Trainer(cfg, mesh=mesh, search_chunk=256)
        state = tr.init_state(rng, batches[0])
        losses = []
        for b in batches:
            state, m = tr.train_step(state, b, rng)
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    l_mesh = run(make_mesh())
    l_single = run(None)
    # both trained (loss dropped) and the trajectories stay close
    assert l_mesh[-1] < l_mesh[0]
    assert l_single[-1] < l_single[0]
    np.testing.assert_allclose(l_mesh, l_single, rtol=0.15, atol=0.05)


@pytest.mark.slow
def test_mesh_step_production_shapes():
    """One mesh train step at the PRODUCTION shapes (8192 points, caps
    (4096, 1024), flagship arch) on the 8-device CPU mesh, batch 16 so the
    mesh-accum composition (2 blocks/device) is the path that compiles.
    Slow: the CPU compile of the full flagship program takes ~10 min."""
    from pointcloudsegmentation_tpu.train import s3dis_config

    mesh = make_mesh()
    cfg = s3dis_config(data_num_points=8192, data_caps=(4096, 1024),
                       optim_epoch_steps=10)
    tr = Trainer(cfg, mesh=mesh)
    rng = jax.random.PRNGKey(0)
    batch = next(toy.toy_batches(1, batch_size=16, num_points=8192,
                                 kind="room", num_classes=13, feat_dim=12))
    state = tr.init_state(rng, batch)
    assert tr._use_mesh_accum(state, batch, jax.random.split(rng, 16))
    state, m = tr.train_step(state, batch, rng)
    assert np.isfinite(float(m["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_scannet_ignore_label():
    from pointcloudsegmentation_tpu.train import scannet_config
    # feat_dim 1 dummy: the tiny arch's convs take features (the flagship
    # scannet arch's nofeats first conv is covered by the slow model tests);
    # this test pins the ignore-label LOSS semantics
    cfg = scannet_config(model="tiny_s3dis", data_num_points=512,
                         data_caps=(256, 64), data_feat_dim=1,
                         optim_epoch_steps=10)
    trainer = Trainer(cfg, search_chunk=256)
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(1, batch_size=1, num_points=512,
                                   kind="room", num_classes=21, feat_dim=1))
    state = trainer.init_state(rng, batches[0])
    state, m = trainer.train_step(state, batches[0], rng)
    assert np.isfinite(float(m["loss"]))
    # ignored points (label 0) are excluded from the count
    n_ignored = int((batches[0]["labels"] == 0).sum())
    assert int(m["count"]) == int(batches[0]["mask"].sum()) - n_ignored


@pytest.mark.slow
def test_context_trainer():
    """Context-fusion training step (train_gpn_semantic3d_context analog)."""
    from pointcloudsegmentation_tpu.train import semantic3d_config

    cfg = semantic3d_config(model="context_semantic3d",
                            data_num_points=256, data_caps=(128, 32),
                            data_num_classes=8, data_feat_dim=13,
                            data_ignore_label=0, optim_epoch_steps=5)
    trainer = Trainer(cfg, search_chunk=128)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    base = list(toy.toy_batches(1, batch_size=2, num_points=256,
                                kind="room", num_classes=8, feat_dim=13))[0]
    nc = 32
    base["ctx_xyz"] = rng.uniform(-25, 25, (2, nc, 3)).astype(np.float32)
    base["ctx_feats"] = rng.randn(2, nc, 13).astype(np.float32)
    base["ctx_mask"] = np.ones((2, nc), bool)
    base["ctx_idx"] = rng.randint(0, nc, (2, 256)).astype(np.int32)

    state = trainer.init_state(key, base)
    state, m = trainer.train_step(state, base, key)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_synthetic_convergence_regression():
    """Pinned convergence regression: the flagship model reaches
    mIoU >= 0.55 on synthetic S3DIS blocks within 8 epochs (the validated
    round-1 run hit 0.59; this is the recorded threshold —
    docs/STATUS_r1.md).  Slow: full-size training on CPU."""
    from pointcloudsegmentation_tpu.data import toy
    from pointcloudsegmentation_tpu.train import s3dis_config
    from pointcloudsegmentation_tpu.train.metrics import MetricAccumulator

    cfg = s3dis_config(data_num_points=2048, data_caps=(1024, 256),
                       optim_epoch_steps=25)
    tr = Trainer(cfg, search_chunk=512)
    rng = jax.random.PRNGKey(0)
    train_b = list(toy.toy_batches(25, 2, num_points=2048, kind="room",
                                   seed=0))
    test_b = list(toy.toy_batches(5, 2, num_points=2048, kind="room",
                                  seed=1))
    state = tr.init_state(rng, train_b[0])
    miou = 0.0
    for epoch in range(8):
        for b in train_b:
            state, _ = tr.train_step(state, b, rng)
        acc = MetricAccumulator(cfg.data.num_classes)
        for b in test_b:
            _, m = tr.eval_step(state, b, rng)
            acc.update(m["cm"], m["loss"])
        miou = acc.result()["miou"]
        if miou >= 0.55:
            break
    assert miou >= 0.55, f"converged only to mIoU {miou:.3f}"


def test_nonfinite_guard():
    """A batch that produces NaN gradients must not poison the params."""
    cfg = tiny_cfg()
    trainer = Trainer(cfg, search_chunk=256)
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(1, batch_size=1, num_points=512,
                                   kind="room"))
    state = trainer.init_state(rng, batches[0])
    state, m0 = trainer.train_step(state, batches[0], rng)
    good_params = jax.tree_util.tree_map(np.asarray, state.params)

    bad = dict(batches[0])
    bad["feats"] = np.full_like(bad["feats"], np.nan)
    state, m = trainer.train_step(state, bad, rng)
    assert int(m["skipped"]) == 1
    for new, old in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(good_params)):
        np.testing.assert_array_equal(np.asarray(new), old)
    # and a good batch afterwards still trains
    state, m2 = trainer.train_step(state, batches[0], rng)
    assert int(m2["skipped"]) == 0 and np.isfinite(float(m2["loss"]))


def test_default_suite_convergence_threshold():
    """Pinned training-quality signal IN THE DEFAULT SUITE (the full-size
    convergence regression is slow-marked and the TPU run supersedes it —
    this keeps CI honest on a tiny arch): tiny_s3dis on synthetic room
    blocks must clear a pinned test-mIoU floor within 8 tiny epochs.
    Threshold discovered empirically (see docs/STATUS_r3.md); a regression
    below it means the training path (search, convs, pooling, loss,
    optimizer) degraded."""
    from pointcloudsegmentation_tpu.train.metrics import MetricAccumulator

    cfg = tiny_cfg()
    trainer = Trainer(cfg, search_chunk=256)
    rng = jax.random.PRNGKey(1)
    train_b = list(toy.toy_batches(8, batch_size=2, num_points=512,
                                   kind="room", num_classes=13,
                                   feat_dim=12, seed=0))
    test_b = list(toy.toy_batches(3, batch_size=2, num_points=512,
                                  kind="room", num_classes=13,
                                  feat_dim=12, seed=1))
    state = trainer.init_state(rng, train_b[0])
    for epoch in range(30):
        for b in train_b:
            state, _ = trainer.train_step(state, b, rng)
    acc = MetricAccumulator(cfg.data.num_classes)
    for b in test_b:
        _, m = trainer.eval_step(state, b, rng)
        acc.update(m["cm"], m["loss"])
    miou = acc.result()["miou"]
    # measured 0.314 at pinning time (30 tiny epochs); 0.25 floor leaves
    # noise margin while staying far above the undertrained ~0.14 state
    assert miou >= 0.25, f"tiny convergence regression: mIoU {miou:.3f}"


def test_hard_synth_convergence_threshold():
    """Pinned convergence floor on the HARD synthetic generator (VERDICT
    r4 #6): scanner density gradients, occlusion dropout, speckle, rarer
    minority classes and 2-room scenes (data/synth_rooms.py hard mode).
    The tiny arch must still learn the dominant structure; a regression
    below the floor means the search/conv path degraded on non-uniform
    densities.  Threshold measured at pinning time (see the assert)."""
    from pointcloudsegmentation_tpu.data import batching, synth_rooms
    from pointcloudsegmentation_tpu.train.metrics import MetricAccumulator

    cfg = tiny_cfg()
    trainer = Trainer(cfg, search_chunk=256)
    rng = jax.random.PRNGKey(1)
    nprng = np.random.RandomState(0)

    def batches(seed, n_rooms):
        blocks = synth_rooms.room_blocks(np.random.RandomState(seed),
                                         n_rooms, model="train", hard=True,
                                         rooms_per_scene=2)
        padded = [batching.pad_block(b["xyz"], b["feats"], b["labels"],
                                     512, rng=nprng) for b in blocks]
        return [batching.stack_blocks(padded[i:i + 2], 2, rng=nprng)
                for i in range(0, len(padded) - 1, 2)]

    train_b = batches(0, 1)[:10]
    test_b = batches(7, 1)[:4]
    state = trainer.init_state(rng, train_b[0])
    for epoch in range(20):
        for b in train_b:
            state, _ = trainer.train_step(state, b, rng)
    acc = MetricAccumulator(cfg.data.num_classes)
    for b in test_b:
        _, m = trainer.eval_step(state, b, rng)
        acc.update(m["cm"], m["loss"])
    miou = acc.result()["miou"]
    # measured 0.529 at pinning time (tiny arch, 20 tiny epochs, hard
    # 2-room scenes at 512-pt crops); floor 0.35 leaves seed/noise margin
    # while staying far above the untrained ~0.03 state
    assert miou >= 0.35, f"hard-synth convergence regression: {miou:.3f}"
