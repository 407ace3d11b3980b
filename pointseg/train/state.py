"""Train state and jitted train/eval steps.

Rebuilds the reference's per-step logic (Training/training.py:29-133)
as two jitted pure functions over an explicit state pytree:

- `train_step`: forward (train mode, BatchNorm batch stats + dropout +
  FPS rng) -> masked CE -> grads -> Adam update -> new state, plus the
  on-device metrics the reference computes every `log_interval` steps
  (training.py:62-69). Metrics are always computed — they're one fused
  kernel, cheaper than a host round-trip decision.
- `eval_step`: forward (eval mode, running BN stats) -> loss + streaming
  metric contributions (correct/total, confusion, per-class I/U,
  training.py:106-124) accumulated on device.

Both donate the state argument so parameters update in place on HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax

from pointseg.train.loss import masked_onehot_cross_entropy
from pointseg.train import metrics as M


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def make_optimizer(
    learning_rate: float = 1e-3,
    schedule: str = "constant",
    total_steps: int | None = None,
    warmup_steps: int = 0,
    grad_clip: float | None = None,
) -> optax.GradientTransformation:
    """Adam with optional LR schedule and gradient clipping.

    The reference trains with fixed-LR Adam and no clipping
    (train.py:79); `constant` with no clip reproduces that exactly.
    `cosine`/`warmup_cosine` need `total_steps`.
    """
    if schedule == "constant":
        lr = learning_rate
    elif schedule == "cosine":
        assert total_steps, "cosine schedule needs total_steps"
        lr = optax.cosine_decay_schedule(learning_rate, total_steps)
    elif schedule == "warmup_cosine":
        assert total_steps, "warmup_cosine schedule needs total_steps"
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    else:
        raise ValueError(f"unknown schedule '{schedule}'")
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(lr))
    # plain adam (no chain wrapper): keeps the opt_state pytree structure
    # identical to the reference configuration so checkpoints stay
    # compatible across option changes
    return optax.adam(lr)


def create_train_state(
    model,
    example_points: jax.Array,
    learning_rate: float = 1e-3,
    tx: optax.GradientTransformation | None = None,
    seed: int = 0,
) -> TrainState:
    """Initializes params/BN stats and the Adam optimizer
    (reference uses Adam(lr=1e-3), train.py:17,79).

    The init is jitted: eager (op-by-op) execution over the relayed TPU
    runtime costs a ~3 ms round trip per op, which turns model.init
    into minutes for the deeper models (measured round 2; CLAUDE.md
    "Environment gotchas")."""
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.key(seed), example_points)
    tx = tx if tx is not None else make_optimizer(learning_rate)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


@partial(jax.jit, donate_argnums=(0,))
def train_step(
    state: TrainState,
    points: jax.Array,
    labels: jax.Array,
    lengths: jax.Array,
    rng: jax.Array,
) -> tuple[TrainState, dict]:
    """One optimization step + train-batch metrics.

    The model runs UNMASKED (padded zeros join regions/pools — the
    reference behavior, SURVEY.md hard-part (b)), which also keeps the
    geometric primitives on their fused Pallas fast path; the loss and
    metrics are length-masked as always.
    """
    dropout_rng, fps_rng = jax.random.split(jax.random.fold_in(rng, state.step))

    def loss_fn(params):
        logits, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            points,
            train=True,
            rngs={"dropout": dropout_rng, "fps": fps_rng},
            mutable=["batch_stats"],
        )
        loss = masked_onehot_cross_entropy(logits, labels, lengths)
        return loss, (logits, updates["batch_stats"])

    (loss, (logits, new_batch_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    accuracy = M.overall_accuracy(logits, labels, lengths)
    miou, _ = M.intersection_over_union(logits, labels, lengths)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )
    return new_state, {"loss": loss, "accuracy": accuracy, "miou": miou}


@partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
def train_steps_repeated(
    state: TrainState,
    points: jax.Array,
    labels: jax.Array,
    lengths: jax.Array,
    rng: jax.Array,
    *,
    n_steps: int,
) -> tuple[TrainState, dict]:
    """`n_steps` optimization steps on the SAME batch under ONE dispatch.

    Per-step host dispatch is pure overhead on the TPU runtime (a ~3 ms
    floor per jitted call over the relay, PROFILE_r02.json; worse on a
    loaded host) — for the lighter models it exceeds the device time
    itself. Folding K steps into one `lax.scan` program pays dispatch
    once per K steps; the body is bit-identical to `train_step` (same
    rng fold by `state.step`, so dropout/FPS streams match the
    sequential loop exactly). Returns stacked per-step metrics
    (each a (n_steps,) device array).
    """
    def body(s, _):
        s, m = train_step.__wrapped__(s, points, labels, lengths, rng)
        return s, m

    return jax.lax.scan(body, state, None, length=n_steps)


@partial(jax.jit, donate_argnums=(0,))
def train_steps_stacked(
    state: TrainState,
    points: jax.Array,
    labels: jax.Array,
    lengths: jax.Array,
    rng: jax.Array,
) -> tuple[TrainState, dict]:
    """One dispatch over a CHUNK of K batches with a leading scan axis
    (points (K, B, N, F), labels (K, B, N, C), lengths (K, B)).

    Pairs with `ChunkedDevicePrefetcher`, which already ships K host
    batches per transfer — consuming the stacked chunk directly turns
    K dispatches into one. Semantics identical to K sequential
    `train_step` calls with the same `rng` (see train_steps_repeated).
    """
    def body(s, xs):
        p, l, n = xs
        s, m = train_step.__wrapped__(s, p, l, n, rng)
        return s, m

    return jax.lax.scan(body, state, (points, labels, lengths))


@partial(jax.jit, donate_argnums=(0,))
def train_step_accum(
    state: TrainState,
    points: jax.Array,
    labels: jax.Array,
    lengths: jax.Array,
    rng: jax.Array,
) -> tuple[TrainState, dict]:
    """ONE optimizer update from K micro-batches (gradient accumulation).

    Shapes carry a leading micro-batch axis: points (K, B, N, F),
    labels (K, B, N, C), lengths (K, B). Semantics:

    - grads are the MEAN over the K micro-batch gradients, all taken at
      the same (pre-update) params — exactly what one update on the
      concatenated (K*B)-sample batch computes, up to BatchNorm batch
      statistics (per-micro here, as in standard torch-style
      accumulation) and float reassociation;
    - BatchNorm running stats thread sequentially through the K
      forwards, matching K consecutive un-stepped forwards;
    - micro-batch i draws dropout/FPS rng from
      fold_in(fold_in(rng, state.step), i), so streams are distinct per
      micro-batch and reproducible;
    - `state.step` advances by 1 (optimizer steps, not forwards).

    Why: effective batch sizes whose activations don't fit HBM in one
    program (DGCNN's step temporaries are ~4.8 GB at B=8/N=4096/k=20,
    ROOFLINE_r02.json) — K micro-batches trade wall time for peak
    memory inside one dispatched program. The reference has no
    analogue (it is single-GPU memory-bound at fixed batch).
    Returned metrics are means over the micro-batches.
    """
    base_rng = jax.random.fold_in(rng, state.step)
    zero_grads = jax.tree.map(jnp.zeros_like, state.params)

    def body(carry, xs):
        batch_stats, grad_sum, loss_sum, acc_sum, miou_sum = carry
        p, l, n, i = xs
        dropout_rng, fps_rng = jax.random.split(jax.random.fold_in(base_rng, i))

        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": batch_stats},
                p,
                train=True,
                rngs={"dropout": dropout_rng, "fps": fps_rng},
                mutable=["batch_stats"],
            )
            loss = masked_onehot_cross_entropy(logits, l, n)
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
        acc = M.overall_accuracy(logits, l, n)
        miou, _ = M.intersection_over_union(logits, l, n)
        return (new_bs, grad_sum, loss_sum + loss, acc_sum + acc,
                miou_sum + miou), None

    k = points.shape[0]
    init = (state.batch_stats, zero_grads,
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32))
    idx = jnp.arange(k, dtype=jnp.int32)
    (new_batch_stats, grad_sum, loss_sum, acc_sum, miou_sum), _ = jax.lax.scan(
        body, init, (points, labels, lengths, idx)
    )
    grads = jax.tree.map(lambda g: g / k, grad_sum)
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )
    metrics = {"loss": loss_sum / k, "accuracy": acc_sum / k,
               "miou": miou_sum / k}
    return new_state, metrics


def _eval_outputs(logits, labels, lengths) -> dict:
    loss = masked_onehot_cross_entropy(logits, labels, lengths)
    correct, total = M.update_accuracy(logits, labels, lengths)
    inter, union = M.update_intersection_over_union(logits, labels, lengths)
    confusion = M.confusion_matrix(logits, labels, lengths)
    return {
        "loss": loss,
        "correct": correct,
        "total": total,
        "intersections": inter,
        "unions": union,
        "confusion": confusion,
    }


@jax.jit
def eval_step(
    state: TrainState,
    points: jax.Array,
    labels: jax.Array,
    lengths: jax.Array,
) -> dict:
    """Loss + streaming metric contributions for one eval batch.
    Model runs unmasked (see train_step); metrics are length-masked."""
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        points,
        train=False,
    )
    return _eval_outputs(logits, labels, lengths)


def bn_adapted_model(model):
    """Clone a model for test-time BatchNorm adaptation.

    Dropout is forced off (rate 0 short-circuits in flax, so no RNG is
    needed) while `train=True` makes every BatchNorm normalize with the
    statistics of the batch AT HAND instead of the training-time running
    averages. The running averages in the checkpoint are untouched — the
    mutated batch_stats collection is discarded by the callers below.

    Why this exists: running-average BN is the one place the composed
    system is sensitive to train/eval density shift — models trained on
    sampled-1024-point blocks can collapse when evaluated on whole
    2-3k-point blocks through running stats, while the same forward with
    batch statistics is robust (measured; CLAUDE.md round-2 findings,
    'Eval-mode BN collapse under density shift'). The reference
    implementation has no analogue (torch .eval() always uses running
    stats) — this is an opt-in robustness mode, not the parity default.
    """
    return model.clone(dropout=0.0) if hasattr(model, "dropout") else model


def bn_batch_apply(model, variables, points):
    """Forward with batch-statistics BN; batch_stats updates discarded."""
    logits, _ = bn_adapted_model(model).apply(
        variables, points, train=True, mutable=["batch_stats"]
    )
    return logits


def make_eval_step(model, bn_stats: str = "running"):
    """eval_step variant factory: 'running' (parity default) or 'batch'
    (test-time BN adaptation, see `bn_adapted_model`)."""
    if bn_stats == "running":
        return eval_step
    if bn_stats != "batch":
        raise ValueError("bn_stats must be 'running' or 'batch'")
    adapted = bn_adapted_model(model)

    @jax.jit
    def step(state, points, labels, lengths):
        logits, _ = adapted.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            train=True,
            mutable=["batch_stats"],
        )
        return _eval_outputs(logits, labels, lengths)

    return step
