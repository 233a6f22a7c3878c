"""Training / evaluation / calibration loop.

Functional re-design of the reference trainer (fix_train.py:676-794,
1076-1133): jitted train and eval steps over (params, state, opt) pytrees,
with the reference's input conditioning, cross-entropy objective, top-k error
metrics, finetune_iters cap (tiny finetuning) and bn-calibration phase.

Data parallelism: steps are jitted with sharding-annotated inputs; on a
multi-device mesh the batch is sharded over the 'data' axis and XLA emits the
gradient all-reduce (see f8net_tpu.parallel).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .optim import sgd_init, sgd_update, weight_decay_mask
from .schedules import lr_schedule


def condition_input(images, cfg, plan_head_fl: Optional[int] = None):
    """Reference input conditioning (fix_train.py:676-694).

    Unnormalized pipeline: images in [0,1] -> round(255 x)/256 (the head conv
    is weight-only and consumes the fraclen-8 grid).  Normalized pipeline:
    images already mean/std normalized pass through (the head quantizes).
    """
    if cfg.normalize:
        return images
    return jnp.round(255.0 * images) / 256.0


def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def topk_correct(logits, labels, ks=(1, 5)):
    """Number of correct predictions at each k."""
    out = {}
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits, maxk)
    match = pred == labels[:, None]
    for k in ks:
        out[k] = jnp.sum(match[:, :k])
    return out


def make_train_step(model, cfg, tcfg):
    """Returns a jitted step:
    (params, state, opt, batch, lr) -> (params, state, opt, metrics)."""
    mask = None  # built lazily against the param structure

    def step(params, state, opt, images, labels, lr):
        x = condition_input(images, cfg)

        def loss_fn(p):
            logits, new_state = model.forward(p, state, x, "train", cfg)
            loss = cross_entropy_loss(logits, labels)
            return loss, (logits, new_state)

        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        nonlocal mask
        if mask is None:
            mask = weight_decay_mask(
                model.graph, params, tcfg.weight_decay_scheme, tcfg.weight_decay
            )
        params, opt = sgd_update(
            params, grads, opt, lr, mask, tcfg.momentum, tcfg.nesterov
        )
        correct = topk_correct(logits, labels, tcfg.topk)
        metrics = {"loss": loss, "n": jnp.asarray(labels.shape[0])}
        for k, v in correct.items():
            metrics[f"top{k}"] = v
        return params, new_state, opt, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_eval_step(model, cfg, tcfg, mode: str = "eval"):
    def step(params, state, images, labels):
        x = condition_input(images, cfg)
        logits, new_state = model.forward(params, state, x, mode, cfg)
        loss = cross_entropy_loss(logits, labels)
        correct = topk_correct(logits, labels, tcfg.topk)
        metrics = {"loss": loss, "n": jnp.asarray(labels.shape[0])}
        for k, v in correct.items():
            metrics[f"top{k}"] = v
        return new_state, metrics

    return jax.jit(step, static_argnames=())


class Trainer:
    """Orchestrates epochs: train -> val -> checkpoint, with calib and
    tiny-finetuning support (SURVEY.md §3.1/§3.2 call stacks)."""

    def __init__(self, model, cfg, tcfg, log=print):
        self.model = model
        self.cfg = cfg
        self.tcfg = tcfg
        self.log = log
        self.train_step = make_train_step(model, cfg, tcfg)
        self.eval_step = make_eval_step(model, cfg, tcfg)
        self.calib_step = make_eval_step(model, cfg, tcfg, mode="calib")

    def init(self, rng):
        params, state = self.model.init(rng)
        return params, state, sgd_init(params)

    def run_epoch(
        self,
        params,
        state,
        opt,
        loader,
        epoch: int,
        steps_per_epoch: int,
        phase: str = "train",
    ):
        """loader yields (images NHWC float [0,1] or normalized, labels int32)."""
        t0 = time.time()
        sched = lr_schedule(self.tcfg, steps_per_epoch)
        totals: Dict[str, Any] = {}
        nb = 0
        for batch_idx, (images, labels) in enumerate(loader):
            if phase == "train":
                fi = self.tcfg.finetune_iters
                if fi is not None and batch_idx >= fi:
                    break
                lr = self.tcfg.lr * sched(epoch * steps_per_epoch + batch_idx)
                params, state, opt, metrics = self.train_step(
                    params, state, opt, images, labels, lr
                )
            elif phase == "calib":
                if 0 <= self.tcfg.bn_calib_batch_num == batch_idx:
                    break
                state, metrics = self.calib_step(params, state, images, labels)
            else:
                new_state, metrics = self.eval_step(params, state, images, labels)
                del new_state  # eval leaves state untouched
            nb += 1
            if self.tcfg.print_each_iter:
                # per-iteration error lines (fix_train.py:714-715); costs a
                # host sync per batch, so it is opt-in like the reference
                bn = float(metrics["n"])
                for k in self.tcfg.topk:
                    self.log(
                        f"top{k} err: {1.0 - float(metrics[f'top{k}']) / bn}."
                    )
            # accumulate on device (async dispatch); one host sync per epoch,
            # not per batch -- per-batch float() costs a full round trip on
            # relay-attached hosts
            for k, v in metrics.items():
                totals[k] = v if k not in totals else totals[k] + v
        totals = {k: float(v) for k, v in totals.items()}
        n = max(totals.get("n", 1.0), 1.0)
        results = {"loss": totals.get("loss", 0.0) / max(nb, 1)}
        for k in self.tcfg.topk:
            results[f"top{k}_error"] = 1.0 - totals.get(f"top{k}", 0.0) / n
        self.log(
            f"{time.time() - t0:.1f}s\t{phase}\t{epoch}/{self.tcfg.num_epochs}: "
            + ", ".join(f"{k}: {v:.3f}" for k, v in results.items())
        )
        return params, state, opt, results
