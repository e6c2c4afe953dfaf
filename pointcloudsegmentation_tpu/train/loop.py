"""Generic training loop: Adam + staircase exp LR decay, class-weighted CE
with ignore-label masking, jitted data-parallel train step, streaming IoU,
per-epoch checkpointing.

Replaces the shared skeleton of every reference train_*.py
(train_graph_pool_new.py:76-132 train_ops, :135-180 train_one_epoch) and its
multi-GPU tower replication + CPU ``average_gradients`` (train_util.py:77-111)
with one compiled step whose gradient all-reduce XLA lays onto ICI.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel import mesh as mesh_lib
from ..utils.logging import get_logger
from . import metrics as metrics_lib
from .config import TrainConfig
from .model_zoo import build_model

log = get_logger(__name__)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Staircase exponential decay with a floor
    (train_graph_pool_new.py:83-85: exponential_decay + maximum(lr_clip))."""
    o = cfg.optim
    return optax.exponential_decay(
        init_value=o.lr_init,
        transition_steps=o.decay_epoch * o.epoch_steps,
        decay_rate=o.decay_rate,
        staircase=True,
        end_value=o.lr_clip)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(make_lr_schedule(cfg))


def seg_loss_terms(logits: jnp.ndarray, labels: jnp.ndarray,
                   mask: jnp.ndarray,
                   class_weights: Optional[jnp.ndarray],
                   ignore_label: Optional[int]):
    """Unnormalized weighted-CE terms: (sum(w·ce), sum(w), labels, valid).

    The weights w depend only on labels/mask — never on params — so
    per-block sums are linear in the block: the batch loss
    ``Σ_b S_b / Σ_b W_b`` and its gradient ``Σ_b ∇S_b / Σ_b W_b`` can be
    accumulated block-by-block (the train step's scan path).
    """
    logits = logits.astype(jnp.float32)  # loss always in f32
    valid = mask
    if ignore_label is not None:
        valid = valid & (labels != ignore_label)
        if ignore_label == 0:
            labels = jnp.maximum(labels - 1, 0)
    # corrupt labels outside [0, C) are excluded from the loss and counts
    # (not clamped toward class C-1); the clip below only makes the
    # take_along_axis index safe for already-masked rows
    valid = valid & (labels >= 0) & (labels < logits.shape[-1])
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    ce = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                              labels[..., None], axis=-1)[..., 0]
    w = jnp.ones_like(ce) if class_weights is None \
        else jnp.take(class_weights, labels)
    w = w * valid.astype(ce.dtype)
    return jnp.sum(w * ce), jnp.sum(w), labels, valid


def seg_loss(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray,
             class_weights: Optional[jnp.ndarray],
             ignore_label: Optional[int]) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                   jnp.ndarray]:
    """Weighted sparse softmax CE over valid (+ non-ignored) points.

    Matches tf.losses.sparse_softmax_cross_entropy with per-point weights
    (sum(w·ce)/sum(w), train_graph_pool_new.py:66-68) and ScanNet's
    ignore-label-0 masking with labels shifted by -1
    (train_gpn_scannet_new.py:81-88).

    Returns (loss, effective labels, effective mask).
    """
    s, w, labels, valid = seg_loss_terms(logits, labels, mask,
                                         class_weights, ignore_label)
    return s / jnp.maximum(w, 1e-6), labels, valid


@dataclass
class Trainer:
    """Owns model/optimizer/state and the compiled train/eval steps."""

    cfg: TrainConfig
    mesh: Optional[Any] = None
    search_chunk: int = 1024

    def __post_init__(self):
        import os

        from ..models.layers import set_compute_dtype

        set_compute_dtype(
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None)
        # Batch-strategy knobs are captured ONCE here: the jitted step caches
        # its traced program, so changing these env vars after the first
        # compiled step would silently have no effect — a/b scripts build a
        # fresh Trainer per arm (scripts/ab_arms.py) for exactly this reason.
        self._batch_vmap = os.environ.get("PCS_BATCH_VMAP", "") == "1"
        self._no_accum = os.environ.get("PCS_NO_ACCUM", "") == "1"
        self._accum_unroll = max(
            1, int(os.environ.get("PCS_ACCUM_UNROLL", "1")))
        self.model = build_model(self.cfg, search_chunk=self.search_chunk)
        self.tx = make_optimizer(self.cfg)
        d = self.cfg.data
        self.class_weights = (
            None if d.class_weights is None
            else jnp.asarray(d.class_weights, jnp.float32))
        self._train_step = jax.jit(self._step, static_argnames=("train",),
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(partial(self._step, train=False))
        self._lr_schedule = make_lr_schedule(self.cfg)

    def lr_at(self, step) -> float:
        """Current learning rate — for curve logging (the reference's
        tf.summary lr scalar, train_gpn_scannet_new.py:85)."""
        return float(self._lr_schedule(int(step)))

    # -- init ------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: Dict) -> TrainState:
        xyz = jnp.asarray(example_batch["xyz"][0])
        feats = jnp.asarray(example_batch["feats"][0])
        mask = jnp.asarray(example_batch["mask"][0])
        # jit the init: eager init dispatches hundreds of tiny compiles,
        # which is pathologically slow through the remote-TPU tunnel
        init_fn = jax.jit(partial(self.model.init, train=False))
        if "ctx_xyz" in example_batch:
            params = init_fn(
                rng, xyz, feats, mask,
                jnp.asarray(example_batch["ctx_xyz"][0]),
                jnp.asarray(example_batch["ctx_feats"][0]),
                jnp.asarray(example_batch["ctx_mask"][0]),
                jnp.asarray(example_batch["ctx_idx"][0]))
        elif "dense_xyz" in example_batch:
            params = init_fn(
                rng, xyz, feats, mask,
                jnp.asarray(example_batch["dense_xyz"][0]),
                jnp.asarray(example_batch["dense_feats"][0]),
                jnp.asarray(example_batch["dense_mask"][0]))
        else:
            params = init_fn(rng, xyz, feats, mask)
        from jax.flatten_util import ravel_pytree
        vec_p, _ = ravel_pytree(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=self.tx.init(vec_p))
        if self.mesh is not None:
            state = mesh_lib.replicate(state, self.mesh)
        return state

    # -- steps -----------------------------------------------------------
    def _map_blocks(self, fn, *args):
        """Apply ``fn`` across the batch axis.

        Single-chip default: in-graph sequential ``lax.map`` (scan).
        Measured on TPU v5e (BASELINE.md round 3): the vmapped step
        executes ~33% slower per block than the single-block program
        (10.3 vs 7.75 ms fwd — batching the windowed gathers/selection
        quadruples live buffer sizes and splits XLA's fusions), and
        degrades superlinearly at batch 8.  Sequential blocks keep the
        single-block program's efficiency; gradients flow through scan
        like any other op.  ``PCS_BATCH_VMAP=1`` restores vmap for A/B.

        The mesh (data-parallel) path keeps vmap: there the batch axis is
        device-SHARDED, and a scan over a sharded axis would serialize
        the devices instead of running them in parallel.
        """
        if self.mesh is not None or self._batch_vmap:
            return jax.vmap(fn)(*args)
        return jax.lax.map(lambda t: fn(*t), tuple(args))

    def _batched_logits(self, params, batch, rngs, train: bool):
        if "ctx_xyz" in batch:
            # context-fusion models take the 50 m context cloud + per-point
            # context indices (train_gpn_semantic3d_context tower_loss)
            def one_ctx(xyz, feats, mask, cx, cf, cm, ci, rng):
                return self.model.apply(params, xyz, feats, mask, cx, cf,
                                        cm, ci, train,
                                        rngs={"dropout": rng})
            return self._map_blocks(
                one_ctx, batch["xyz"], batch["feats"], batch["mask"],
                batch["ctx_xyz"], batch["ctx_feats"], batch["ctx_mask"],
                batch["ctx_idx"], rngs)

        if "dense_xyz" in batch:
            # dense-pipeline models take the dense cloud next to the
            # sampled points (train_gpn_semantic3d_dense tower_loss)
            def one_dense(xyz, feats, mask, dx, df, dm, rng):
                return self.model.apply(params, xyz, feats, mask, dx, df,
                                        dm, train, rngs={"dropout": rng})
            return self._map_blocks(
                one_dense, batch["xyz"], batch["feats"], batch["mask"],
                batch["dense_xyz"], batch["dense_feats"],
                batch["dense_mask"], rngs)

        def one(xyz, feats, mask, rng):
            return self.model.apply(params, xyz, feats, mask, train,
                                    rngs={"dropout": rng})
        return self._map_blocks(one, batch["xyz"], batch["feats"],
                                batch["mask"], rngs)

    def _apply_update(self, state: TrainState, grads, loss):
        """Adam update + the non-finite step guard (the reference has no
        failure handling, SURVEY §5): a bad batch must not poison the
        parameters — keep the previous state and count the skipped step.

        The update runs on the FLATTENED gradient vector: the model has
        ~250 parameter tensors, and per-leaf Adam + guard selects lowered
        to ~1500 tiny dispatch-bound fusions (measured ~3.7 ms/step of
        select_add fusions in the r5 step trace).  One ravel -> one Adam on
        [P] -> one guard select -> unravel-and-add collapses that to a
        handful of fused kernels.  opt_state therefore holds Adam moments
        for the flat vector (checkpoints from the per-leaf format are not
        interchangeable)."""
        from jax.flatten_util import ravel_pytree

        vec_g, _ = ravel_pytree(grads)
        good = jnp.isfinite(loss) & jnp.all(jnp.isfinite(vec_g))
        updates_vec, opt_state = self.tx.update(vec_g, state.opt_state)
        # zero the update on bad steps (params unchanged) and keep the
        # previous optimizer state (moments AND step count revert)
        updates_vec = jnp.where(good, updates_vec, 0.0)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old)
            if hasattr(new, "shape") else new,
            opt_state, state.opt_state)
        _, unravel = ravel_pytree(state.params)
        params = jax.tree_util.tree_map(
            jnp.add, state.params, unravel(updates_vec))
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), good

    def _accum_eligible(self, state: TrainState, batch: Dict, rngs) -> bool:
        """Plain per-point segmentation (per-block logits [N, C]) with no
        auxiliary context/dense inputs — the shape the accumulation scan
        handles.  Trace-time only."""
        if "ctx_xyz" in batch or "dense_xyz" in batch \
                or self._batch_vmap or self._no_accum:
            return False
        try:
            sh = jax.eval_shape(
                lambda p: self.model.apply(
                    p, batch["xyz"][0], batch["feats"][0],
                    batch["mask"][0], True, rngs={"dropout": rngs[0]}),
                state.params)
        except Exception:
            return False
        return sh.ndim == 2

    def _use_accum(self, state: TrainState, batch: Dict, rngs) -> bool:
        """Single-chip gradient-accumulation scan path."""
        return self.mesh is None and self._accum_eligible(state, batch,
                                                          rngs)

    def _use_mesh_accum(self, state: TrainState, batch: Dict,
                        rngs) -> bool:
        """Mesh DP with batch_per_device > 1: accumulate the per-device
        blocks inside shard_map (scan per shard + one grad psum over the
        data axis) instead of vmapping all blocks — composes the measured
        single-chip accumulation win (BASELINE.md: vmap runs ~33% slower
        per block) with data parallelism.  batch_per_device == 1 keeps
        the plain GSPMD-vmap path (nothing to accumulate)."""
        return (self.mesh is not None
                and batch["xyz"].shape[0] > self.mesh.size
                and batch["xyz"].shape[0] % self.mesh.size == 0
                and self._accum_eligible(state, batch, rngs))

    def _block_terms(self, params, xyz, feats, mask, labels, r):
        """One block's unnormalized loss terms + metrics — the body the
        accumulation scan runs per block (and the unit bench.py counts
        FLOPs for, see step_flops)."""
        d = self.cfg.data
        logits = self.model.apply(params, xyz, feats, mask, True,
                                  rngs={"dropout": r})
        s, w, labels_eff, valid = seg_loss_terms(
            logits, labels, mask, self.class_weights, d.ignore_label)
        preds = jnp.argmax(logits, axis=-1)
        cm = metrics_lib.confusion_matrix(labels_eff, preds, d.num_classes,
                                          mask=valid)
        correct = jnp.sum((preds == labels_eff) & valid)
        return s, (w, cm, correct, jnp.sum(valid))

    def _accum_terms(self, params, xyz, feats, mask, labels, rngs):
        """Per-block value_and_grad inside a lax.scan, sums accumulated:
        returns (gacc, s, w, cm, correct, count) over the given blocks."""
        C = self.cfg.data.num_classes

        gfn = jax.value_and_grad(self._block_terms, has_aux=True)
        carry0 = (jax.tree_util.tree_map(jnp.zeros_like, params),
                  jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                  jnp.zeros((C, C), jnp.float32),
                  jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

        def body(carry, xs):
            gacc, sacc, wacc, cmacc, cacc, nacc = carry
            (s, (w, cm, correct, cnt)), g = gfn(params, *xs)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
            return (gacc, sacc + s, wacc + w, cmacc + cm,
                    cacc + correct, nacc + cnt), None

        # unroll would let XLA software-pipeline blocks (overlap one
        # block's VPU-heavy selection with another's MXU-heavy convs);
        # measured NEUTRAL at batch 4 on v5e (544.7/544.9/544.9k at
        # unroll 1/2/4 — the chip saturates within a block), kept as a
        # knob for other chips/batch shapes
        (gacc, s, w, cm, correct, count), _ = jax.lax.scan(
            body, carry0, (xyz, feats, mask, labels, rngs),
            unroll=self._accum_unroll)
        return gacc, s, w, cm, correct, count

    def _accum_train_step(self, state: TrainState, batch: Dict, rngs):
        """Grad-accumulation train step (single chip).

        Measured on TPU v5e (BASELINE.md round 3): the batched (vmapped)
        step runs ~33% slower per block than the single-block program,
        and grad-of-scan over blocks spills every block's residuals to
        HBM before the first backward runs.  Running each block's
        fwd+bwd back-to-back inside the scan keeps residual lifetimes
        short and the single-block program's efficiency; the gradient is
        EXACT (seg_loss_terms: per-point weights are params-independent,
        so ∇(ΣS_b/ΣW_b) = Σ∇S_b / ΣW_b)."""
        gacc, s, w, cm, correct, count = self._accum_terms(
            state.params, batch["xyz"], batch["feats"], batch["mask"],
            batch["labels"], rngs)
        return self._finish_accum(state, gacc, s, w, cm, correct, count)

    def _mesh_accum_train_step(self, state: TrainState, batch: Dict, rngs):
        """Mesh DP step with per-device gradient accumulation: each device
        scans over its batch_per_device local blocks (same program as the
        single-chip accumulation path), then ONE psum over the 'data' axis
        reduces (grads, loss terms, metrics) across devices.  The update is
        exact and identical to accumulating all B blocks on one chip:
        ∇(Σ_b S_b / Σ_b W_b) = Σ_b ∇S_b / Σ_b W_b with the sums taken
        globally (psum of the per-device partial sums)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        ax = mesh.axis_names[0]

        def local_terms(params, xyz, feats, mask, labels, rs):
            terms = self._accum_terms(params, xyz, feats, mask, labels, rs)
            return jax.lax.psum(terms, ax)

        # check_vma=False: the accumulation scan's zero-initialized carry is
        # device-unvarying while the body's outputs vary over 'data', which
        # the varying-manual-axes checker rejects; the explicit psum above
        # performs the only cross-device reduction, so the check adds
        # nothing here.
        sharded = shard_map(
            local_terms, mesh=mesh,
            in_specs=(P(), P(ax), P(ax), P(ax), P(ax), P(ax)),
            out_specs=P(), check_vma=False)
        gacc, s, w, cm, correct, count = sharded(
            state.params, batch["xyz"], batch["feats"], batch["mask"],
            batch["labels"], rngs)
        return self._finish_accum(state, gacc, s, w, cm, correct, count)

    def _finish_accum(self, state, gacc, s, w, cm, correct, count):
        denom = jnp.maximum(w, 1e-6)
        loss = s / denom
        grads = jax.tree_util.tree_map(lambda g: g / denom, gacc)
        state, good = self._apply_update(state, grads, loss)
        metrics = {
            "loss": loss,
            "correct": correct,
            "count": count,
            "cm": cm,
            "skipped": (~good).astype(jnp.int32),
        }
        return state, metrics

    def step_flops(self, state: TrainState, batch: Dict,
                   rng: jax.Array) -> float:
        """FLOPs of the program ``train_step(state, batch, rng)`` actually
        executes (for MFU accounting, bench.py).

        XLA's cost analysis counts a ``lax.scan`` body ONCE, so lowering
        the accumulation step directly undercounts by ~the batch size.
        On the accumulation paths the timed program is exactly
        batch × (per-block fwd+bwd) + one Adam update, so count the block
        body directly and scale; the update is O(#params) elementwise ops
        (≪0.1% of a block's matmul work) and is left uncounted.  Non-accum
        paths (vmap / mesh GSPMD) lower flat programs that cost analysis
        counts correctly."""
        bsz = batch["xyz"].shape[0]
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), bsz)
        blocks = None
        if self._use_accum(state, batch, rngs):
            blocks = bsz
        elif self._use_mesh_accum(state, batch, rngs):
            # per-chip program: each device scans its local blocks
            blocks = bsz // self.mesh.size
        if blocks is not None:
            gfn = jax.jit(jax.value_and_grad(self._block_terms,
                                             has_aux=True))
            cost = gfn.lower(
                state.params, batch["xyz"][0], batch["feats"][0],
                batch["mask"][0], batch["labels"][0],
                rngs[0]).compile().cost_analysis()
            return float(cost.get("flops", 0.0)) * blocks
        cost = self._train_step.lower(
            state, batch, rng).compile().cost_analysis()
        return float(cost.get("flops", 0.0))

    def _step(self, state: TrainState, batch: Dict, rng: jax.Array,
              train: bool = True):
        d = self.cfg.data
        bsz = batch["xyz"].shape[0]
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), bsz)
        if train and self._use_accum(state, batch, rngs):
            return self._accum_train_step(state, batch, rngs)
        if train and self._use_mesh_accum(state, batch, rngs):
            return self._mesh_accum_train_step(state, batch, rngs)

        def loss_fn(params):
            logits = self._batched_logits(params, batch, rngs, train)
            if logits.ndim == 2:
                # classification: one logit row + one label per cloud
                # (train_modelnet40.py: single logits per tower)
                labels = batch["labels"][:, 0]
                mask = jnp.any(batch["mask"], axis=1)
            elif logits.ndim == 4:
                # refine cascade: [B, 2, N, C] = (refine, base) logits;
                # loss = refine + base_weight·base
                # (train_graph_pool_refine.py:81-82, --base_weight :33)
                labels, mask = batch["labels"], batch["mask"]
                rloss, labels_eff, valid = seg_loss(
                    logits[:, 0], labels, mask, self.class_weights,
                    d.ignore_label)
                bloss, _, _ = seg_loss(
                    logits[:, 1], labels, mask, self.class_weights,
                    d.ignore_label)
                bw = getattr(self.cfg, "base_loss_weight", 1.0)
                return rloss + bw * bloss, (logits[:, 0], labels_eff, valid)
            else:
                labels, mask = batch["labels"], batch["mask"]
            loss, labels_eff, valid = seg_loss(
                logits, labels, mask, self.class_weights, d.ignore_label)
            return loss, (logits, labels_eff, valid)

        if train:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state, good = self._apply_update(state, grads, loss)
        else:
            loss, aux = loss_fn(state.params)
            good = jnp.asarray(True)

        logits, labels_eff, valid = aux
        preds = jnp.argmax(logits, axis=-1)
        cm = metrics_lib.confusion_matrix(labels_eff, preds, d.num_classes,
                                          mask=valid)
        metrics = {
            "loss": loss,
            "correct": jnp.sum((preds == labels_eff) & valid),
            "count": jnp.sum(valid),
            "cm": cm,
            "skipped": (~good).astype(jnp.int32),
        }
        return state, metrics

    def train_step(self, state, batch, rng):
        if self.mesh is not None:
            batch = mesh_lib.shard_batch(batch, self.mesh)
        return self._train_step(state, batch, rng)

    def eval_step(self, state, batch, rng):
        if self.mesh is not None:
            batch = mesh_lib.shard_batch(batch, self.mesh)
        return self._eval_step(state, batch, rng)

    # -- epochs ----------------------------------------------------------
    def run_epoch(self, state: TrainState, batches: Iterable[Dict],
                  rng: jax.Array, train: bool = True,
                  log_every: Optional[int] = None) -> Tuple[TrainState, Dict]:
        acc = metrics_lib.MetricAccumulator(self.cfg.data.num_classes)
        t0 = time.time()
        points = 0
        blocks = 0
        log_every = log_every or self.cfg.log_every
        sizes = []  # (valid points, blocks) counted on host pre-transfer

        def _counted(bs):
            import numpy as _np
            for b in bs:
                sizes.append((int(_np.asarray(b["mask"]).sum()),
                              b["xyz"].shape[0]))
                yield b

        if self.mesh is None:
            # overlap H2D transfer with compute (the mesh path places
            # per-shard inside shard_batch instead); sizes are counted on
            # the host so the loop never syncs on a device array
            from ..data.provider import device_prefetch
            batches = device_prefetch(_counted(iter(batches)))
        else:
            batches = _counted(iter(batches))
        # device-side accumulation: a per-step np.asarray(cm) would force a
        # host sync every step and serialize the async dispatch pipeline;
        # only the periodic log line and the epoch end read back
        cm_dev = None
        loss_dev = None
        nsteps = 0
        for i, batch in enumerate(batches):
            step_fn = self.train_step if train else self.eval_step
            state, m = step_fn(state, batch, rng)
            cm_dev = m["cm"] if cm_dev is None else cm_dev + m["cm"]
            loss_dev = m["loss"] if loss_dev is None else loss_dev + m["loss"]
            nsteps += 1
            points += sizes[i][0]
            blocks += sizes[i][1]
            if train and i % log_every == 0:
                dt = time.time() - t0
                log.info("step %d loss %.5f | %.1f blocks/s %.0f points/s",
                         i, float(m["loss"]), blocks / dt, points / dt)
        if nsteps:
            acc.update(cm_dev, None)
            acc.loss_sum = float(loss_dev)
            acc.loss_n = nsteps
        res = acc.result()
        res["points_per_sec"] = points / max(time.time() - t0, 1e-9)
        res["blocks_per_sec"] = blocks / max(time.time() - t0, 1e-9)
        return state, res
