"""Self-supervised GraspPointCNN trainer.

TPU-native rebuild of reference train_model.py:155-394:
global z-score normalization (stats kept in the checkpoint), 80/20
random split, class-balanced weighted sampling with replacement,
pos-weighted BCE-with-logits, grad-clip 1.0, torch-Adam-parity optimizer
(L2 folded into the gradient, NOT decoupled), ReduceLROnPlateau,
early-stopping with best-weight restore, per-epoch P/R/F1/confusion
metrics.

Faithfulness notes:
* the reference thresholds *logits* at 0.5 inside analyze_predictions
  (train_model.py:66 receives raw outputs at :295) -- reproduced;
* batches are fixed-size with a validity mask instead of a ragged final
  batch (masked mean == reference's per-batch mean up to the final
  partial batch; we pad by resampling, which the reference's
  with-replacement sampler also does in distribution).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from leafgrasp_tpu.config import TrainConfig, ModelConfig
from leafgrasp_tpu.models.grasp_cnn import GraspPointCNN, init_grasp_cnn

__all__ = ["NormStats", "normalize_dataset", "bce_with_logits",
           "analyze_predictions", "Trainer", "TrainResult",
           "make_train_step"]


class NormStats(NamedTuple):
    """Global z-score stats saved into checkpoints
    (train_model.py:41-62,328)."""
    depth_mean: jnp.ndarray
    depth_std: jnp.ndarray
    score_mean: jnp.ndarray   # (7,) per-channel
    score_std: jnp.ndarray    # (7,)


def normalize_dataset(depth_patches, score_patches):
    """Global z-score of depth (scalar) + per-channel scores."""
    depth_mean = jnp.mean(depth_patches)
    depth_std = jnp.std(depth_patches)
    score_mean = jnp.mean(score_patches, axis=(0, 2, 3), keepdims=True)
    score_std = jnp.std(score_patches, axis=(0, 2, 3), keepdims=True)
    stats = NormStats(depth_mean, depth_std,
                      score_mean.reshape(-1), score_std.reshape(-1))
    return ((depth_patches - depth_mean) / depth_std,
            (score_patches - score_mean) / score_std, stats)


def bce_with_logits(logits, labels, pos_weight: float, mask=None):
    """torch BCEWithLogitsLoss(pos_weight=w) parity, masked mean."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1)
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * labels * log_sig + (1.0 - labels) * log_one_minus)
    if mask is None:
        return jnp.mean(per)
    mask = mask.reshape(-1).astype(per.dtype)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def analyze_predictions(logits: np.ndarray, labels: np.ndarray,
                        threshold: float = 0.5) -> Dict[str, Any]:
    """Reference metric block (train_model.py:64-100). NOTE: thresholds
    raw logits at 0.5, reproducing the reference's quirk (equivalent to
    p > 0.62); pass threshold=0.0 for the calibrated p > 0.5 decision."""
    predicted = (logits.reshape(-1) > threshold).astype(np.float32)
    labels = labels.reshape(-1)
    tp = int(((predicted == 1) & (labels == 1)).sum())
    tn = int(((predicted == 0) & (labels == 0)).sum())
    n_pos = int((labels == 1).sum())
    n_neg = int((labels == 0).sum())
    fp = n_neg - tn
    fn = n_pos - tp
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    return {
        "positive_accuracy": 100.0 * tp / n_pos if n_pos else 0.0,
        "negative_accuracy": 100.0 * tn / n_neg if n_neg else 0.0,
        "precision": precision * 100.0,
        "recall": recall * 100.0,
        "f1_score": f1 * 100.0,
        "confusion_matrix": {"true_positive": tp, "false_positive": fp,
                             "false_negative": fn, "true_negative": tn},
    }


def make_optimizer(cfg: TrainConfig):
    """torch.optim.Adam(lr, weight_decay) parity: clip -> +wd*param ->
    Adam moments -> -lr, with lr injectable for the plateau scheduler."""
    def build(learning_rate, weight_decay):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        )
    # weight_decay injected too: sweep configs differing only in
    # scalar hyperparams then share ONE compiled program per
    # (model shape, batch size) -- compiles dominate sweep wall-clock
    # through the tunnelled backend.
    return optax.inject_hyperparams(build)(
        learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay)


def make_train_step(model: GraspPointCNN, tx, cfg: TrainConfig):
    """Jitted (params, batch_stats, opt_state, batch) -> updated state."""

    def train_step(params, batch_stats, opt_state, feats, labels, mask,
                   dropout_rng, pos_weight):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, feats,
                train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            loss = bce_with_logits(logits, labels, pos_weight, mask)
            return loss, (mutated["batch_stats"], logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        sig = jax.nn.sigmoid(logits.reshape(-1))
        correct = jnp.sum(((sig > 0.5) == (labels.reshape(-1) > 0.5))
                          * mask.reshape(-1))
        return new_params, new_bs, new_opt, loss, correct

    # NOTE: no buffer donation -- best-epoch snapshots alias live params.
    return jax.jit(train_step)


def make_eval_step(model: GraspPointCNN, cfg: TrainConfig):
    def eval_step(params, batch_stats, feats, labels, mask, pos_weight):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             feats, train=False)
        loss = bce_with_logits(logits, labels, pos_weight, mask)
        return loss, logits.reshape(-1)
    return jax.jit(eval_step)


@dataclasses.dataclass
class TrainResult:
    params: Any
    batch_stats: Any
    norm_stats: NormStats
    best_val_loss: float
    best_epoch: int
    metrics: Dict[str, Any]           # metrics at the best epoch
    history: Dict[str, list]
    final_metrics: Dict[str, Any] = dataclasses.field(default_factory=dict)


class Trainer:
    """Host-side training loop (epochs, plateau LR, early stop) driving
    jitted steps. Optionally shards batches over a data-parallel mesh."""

    def __init__(self, model_cfg: ModelConfig = ModelConfig(),
                 cfg: TrainConfig = TrainConfig(), mesh=None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.mesh = mesh

    def fit(self, dataset: Dict[str, np.ndarray],
            epochs: Optional[int] = None,
            log_fn=None) -> TrainResult:
        """dataset: depth_patches (N,P,P), mask_patches (N,P,P),
        score_patches (N,7,P,P), labels (N,)."""
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        rng = jax.random.PRNGKey(cfg.seed)

        depth = jnp.asarray(dataset["depth_patches"], jnp.float32)
        maskp = jnp.asarray(dataset["mask_patches"], jnp.float32)
        scorep = jnp.asarray(dataset["score_patches"], jnp.float32)
        labels = jnp.asarray(dataset["labels"], jnp.float32)

        depth_n, score_n, norm_stats = normalize_dataset(depth, scorep)
        # NHWC features: depth, mask, 7 scores
        feats = jnp.concatenate([
            depth_n[:, :, :, None], maskp[:, :, :, None],
            jnp.moveaxis(score_n, 1, -1)], axis=-1)

        n = feats.shape[0]
        rng, perm_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, n)
        n_train = int((1.0 - cfg.val_fraction) * n)
        tr_idx, va_idx = perm[:n_train], perm[n_train:]
        tr_feats, tr_labels = feats[tr_idx], labels[tr_idx]
        va_feats, va_labels = feats[va_idx], labels[va_idx]

        # class-balanced sampling weights (train_model.py:194-203)
        n_pos = jnp.maximum(jnp.sum(tr_labels == 1), 1)
        n_neg = jnp.maximum(jnp.sum(tr_labels == 0), 1)
        w = jnp.where(tr_labels == 1, 1.0,
                      (n_pos / n_neg).astype(jnp.float32))
        sample_p = w / jnp.sum(w)

        rng, init_rng = jax.random.split(rng)
        model, variables = init_grasp_cnn(init_rng, self.model_cfg,
                                          patch_size=feats.shape[1])
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)

        if self.mesh is not None:
            from leafgrasp_tpu.parallel.sharding import shard_variables
            params, _ = shard_variables(params, self.mesh)
            batch_stats, _ = shard_variables(batch_stats, self.mesh)

        train_step = make_train_step(model, tx, cfg)
        eval_step = make_eval_step(model, cfg)

        bs = cfg.batch_size
        steps = max(1, -(-n_train // bs))
        lr = cfg.learning_rate
        plateau_wait = 0
        best_val = float("inf")
        best_epoch = 0
        best_params = params
        best_bs = batch_stats
        es_best = None
        es_wait = 0
        history = {"train_loss": [], "val_loss": [], "metrics": [],
                   "lr": []}
        final_metrics = {}
        best_metrics = {}

        va_mask = self._batch_pad_mask(va_feats.shape[0], bs)
        va_feats_p, va_labels_p = self._pad(va_feats, bs), \
            self._pad(va_labels, bs)

        pos_w = jnp.float32(cfg.pos_weight)
        for epoch in range(epochs):
            rng, samp_rng, drop_rng = jax.random.split(rng, 3)
            # with-replacement class-balanced sampling for the whole epoch
            idx = jax.random.choice(samp_rng, n_train,
                                    shape=(steps * bs,), replace=True,
                                    p=sample_p)
            # loss/accuracy accumulate ON DEVICE: one value fetch per
            # epoch, not per step (fetches barrier the tunnelled
            # backend at ~27 ms each; dispatches pipeline freely)
            ep_loss = jnp.float32(0.0)
            for s in range(steps):
                b = idx[s * bs:(s + 1) * bs]
                bf, bl = tr_feats[b], tr_labels[b]
                if self.mesh is not None:
                    from leafgrasp_tpu.parallel.sharding import shard_batch
                    bf, bl = shard_batch((bf, bl), self.mesh)
                drop = jax.random.fold_in(drop_rng, s)
                params, batch_stats, opt_state, loss, correct = train_step(
                    params, batch_stats, opt_state, bf, bl,
                    jnp.ones((bs,), jnp.float32), drop, pos_w)
                ep_loss = ep_loss + loss
            train_loss = float(ep_loss) / steps

            # validation over padded fixed-size batches (device-side
            # accumulation; ONE fetch for the concatenated logits)
            val_losses, val_logits = [], []
            n_va_steps = va_feats_p.shape[0] // bs
            for s in range(n_va_steps):
                sl = slice(s * bs, (s + 1) * bs)
                loss, logits = eval_step(params, batch_stats,
                                         va_feats_p[sl], va_labels_p[sl],
                                         va_mask[sl], pos_w)
                val_losses.append(loss)
                val_logits.append(logits)
            val_loss = float(jnp.mean(jnp.stack(val_losses)))
            logits_all = np.asarray(
                jnp.concatenate(val_logits))[:va_feats.shape[0]]
            metrics = analyze_predictions(logits_all,
                                          np.asarray(va_labels))
            # calibrated decision boundary (p > 0.5 <=> logit > 0); the
            # reference's 0.5-on-logits quirk under-reports calibrated
            # models, so both are tracked
            calibrated = analyze_predictions(logits_all,
                                             np.asarray(va_labels),
                                             threshold=0.0)
            metrics = dict(metrics)
            metrics["calibrated"] = calibrated
            final_metrics = metrics

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["metrics"].append(metrics)
            history["lr"].append(lr)

            if log_fn:
                log_fn(epoch=epoch, train_loss=train_loss,
                       val_loss=val_loss, lr=lr, **{
                           k: metrics[k] for k in
                           ("positive_accuracy", "negative_accuracy",
                            "f1_score")})

            # ReduceLROnPlateau(min, 0.5, patience 5, min_lr 1e-6)
            if val_loss < best_val:
                best_val = val_loss
                best_epoch = epoch
                best_params, best_bs = params, batch_stats
                best_metrics = metrics
                plateau_wait = 0
            else:
                plateau_wait += 1
                if plateau_wait > cfg.plateau_patience:
                    lr = max(lr * cfg.plateau_factor, cfg.min_lr)
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(
                        lr, jnp.float32)
                    plateau_wait = 0

            # EarlyStopping(patience 15, min_delta 1e-3, restore best)
            if es_best is None or val_loss < es_best - cfg.early_stop_min_delta:
                es_best = val_loss
                es_wait = 0
            else:
                es_wait += 1
                if es_wait >= cfg.early_stop_patience:
                    break

        return TrainResult(params=best_params, batch_stats=best_bs,
                           norm_stats=norm_stats, best_val_loss=best_val,
                           best_epoch=best_epoch,
                           metrics=best_metrics or final_metrics,
                           final_metrics=final_metrics, history=history)

    @staticmethod
    def _pad(arr, bs):
        n = arr.shape[0]
        pad = (-n) % bs
        if pad == 0:
            return arr
        reps = jnp.concatenate([arr, arr[:pad]], axis=0)
        return reps

    @staticmethod
    def _batch_pad_mask(n, bs):
        pad = (-n) % bs
        return jnp.concatenate([jnp.ones((n,), jnp.float32),
                                jnp.zeros((pad,), jnp.float32)])
