"""Training loop — the reference trainer's flow, jit-compiled and device-hot.

Mirrors reference ``train.py:13-84``: per-epoch train pass collecting
predictions for the four-metric report, metrics persisted on the final train
epoch (flag=0) and after the test pass (flag=1), identical log lines. The
differences are the TPU-native ones: one fused jit step (no per-batch D2H
sync), device-side logit collection transferred once per epoch, optional
bf16 policy, data-parallel mesh sharding, checkpoint/resume, and a
steps/sec + images/sec throughput meter (the BASELINE.json metric).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from kanvit.data.datasets import load_dataset
from kanvit.data.pipeline import (
    CIFAR100_MEAN,
    CIFAR100_STD,
    DataPipeline,
)
from kanvit.models import create_model
from kanvit.parallel import runtime
from kanvit.parallel.distributed import process_batch_slice
from kanvit.parallel.mesh import batch_sharding, create_mesh, shard_state
from kanvit.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from kanvit.train.logging_utils import save_metrics, setup_logging
from kanvit.train.metrics import calculate_metrics
from kanvit.train.state import create_train_state
from kanvit.train.steps import make_eval_step, make_train_step


@dataclass
class TrainConfig:
    epochs: int = 20
    batch_size: int = 128
    learning_rate: float = 1e-3
    # LR schedule (kanvit extension; reference trains at fixed LR):
    # "constant" (optional linear warmup) or "cosine" (warmup + cosine
    # decay to 0 over the run's total step count).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    # AdamW decoupled weight decay (0 = plain Adam, the reference rule) and
    # global-norm gradient clipping (0 = off) — kanvit extensions riding the
    # shared make_optimizer factory.
    weight_decay: float = 0.0
    clip_grad_norm: float = 0.0
    # EMA of post-step params (0 = off): shadow tree rides the opt state
    # (train.state.EmaState); the test pass evaluates the EMA weights.
    ema_decay: float = 0.0
    model_type: str = "vanilla"
    n_blocks: int = 8
    d_hidden: int = 64
    n_heads: int = 8
    log_dir: str = "logs"
    dataset: str = "cifar100"
    data_dir: str | None = None
    seed: int = 0
    bf16: bool = False
    ckpt_dir: str | None = None
    resume: bool = False
    n_model_shards: int = 1
    # Pipeline parallelism: devices split as data x model x pipe; blocks
    # sharded into n_pipe_stages stages, batch streamed through them in
    # n_microbatches microbatches (0 = one per stage). PP composes with DP;
    # not with TP (kanvit/parallel/pipeline.py docstring).
    n_pipe_stages: int = 1
    n_microbatches: int = 0
    # Gradient accumulation: chunks per batch in the non-PP step (one
    # optimizer update per batch either way; PP microbatches already).
    grad_accum_steps: int = 1
    profile_dir: str | None = None
    # H2D transfer lookahead depth (0 = off). device_put is async, so
    # issuing transfers ahead pipelines copies under executing steps on
    # standard PCIe hosts; disabled by default because tunneled transports
    # (e.g. remote-TPU dev setups) can wedge with many in-flight transfers.
    h2d_lookahead: int = 0
    limit_train_batches: int | None = None
    limit_eval_batches: int | None = None
    # Refit B-spline knot grids from live activations every N train steps
    # (0 = off). Working version of the reference's never-called
    # KANLinear.update_grid (effkan.py:189-242); efficientkan only.
    update_grid_every: int = 0


def _dataset_model_config(dataset: str):
    """Reference shapes: CIFAR config from ``train.py:18-20``; MNIST config
    from the ctor defaults (``model.py:49``)."""
    if dataset == "cifar100":
        return dict(chw=(3, 32, 32), n_patches=4, out_d=100)
    if dataset == "digits":
        return dict(chw=(1, 32, 32), n_patches=4, out_d=10)
    return dict(chw=(1, 28, 28), n_patches=7, out_d=10)


def build_pipelines(cfg: TrainConfig):
    x_tr, y_tr, num_classes = load_dataset(cfg.dataset, cfg.data_dir, train=True)
    x_te, y_te, _ = load_dataset(cfg.dataset, cfg.data_dir, train=False)
    is_cifar = cfg.dataset == "cifar100"
    stats = (CIFAR100_MEAN, CIFAR100_STD) if is_cifar else None
    train_pipe = DataPipeline(
        x_tr, y_tr, cfg.batch_size, shuffle=True, augment=is_cifar,
        normalize_stats=stats, seed=cfg.seed,
    )
    # Eval covers the FULL test set (the reference evaluates every sample):
    # the trailing partial batch is kept, padded to the compiled batch shape
    # in the eval loop, and sliced back out of the loss/logits.
    test_pipe = DataPipeline(
        x_te, y_te, cfg.batch_size, shuffle=False, augment=False,
        normalize_stats=stats, seed=cfg.seed, drop_remainder=False,
    )
    return train_pipe, test_pipe, num_classes


def _sched_kw(cfg: TrainConfig, total_steps: int | None) -> dict:
    """Optimizer kwargs forwarded identically to the canonical and PP state
    constructors (both wrap ``make_optimizer``) so the two layouts cannot
    drift."""
    return dict(lr_schedule=cfg.lr_schedule, warmup_steps=cfg.warmup_steps,
                total_steps=total_steps, weight_decay=cfg.weight_decay,
                clip_grad_norm=cfg.clip_grad_norm, ema_decay=cfg.ema_decay)


def build_model_and_state(cfg: TrainConfig, num_classes: int, chw, n_patches,
                          total_steps: int | None = None):
    model = create_model(
        cfg.model_type,
        chw=chw,
        n_patches=n_patches,
        n_blocks=cfg.n_blocks,
        d_hidden=cfg.d_hidden,
        n_heads=cfg.n_heads,
        out_d=num_classes,
        stateful_grid=cfg.update_grid_every > 0,
    )
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((1, *chw), jnp.float32)
    state = create_train_state(model, rng, sample, cfg.learning_rate,
                               **_sched_kw(cfg, total_steps))
    return model, state


def _epoch_metrics(losses, logits_list, labels_list, num_classes,
                   replicate=None):
    # Aggregate on device, then ONE bulk D2H transfer per epoch (fetching
    # hundreds of small per-step outputs individually is both slow and, on
    # tunneled device transports, unreliable). Multi-host runs pass
    # ``replicate`` (a jit identity with replicated out_shardings — an
    # all-gather over DCN) so device_get sees only addressable shards.
    losses = jnp.concatenate([jnp.atleast_1d(l) for l in losses])
    logits = jnp.concatenate(logits_list)
    if replicate is not None:
        losses, logits = replicate(losses, logits)
    losses, logits = jax.device_get((losses, logits))
    losses = np.asarray(losses)
    logits = np.asarray(logits)
    labels = np.concatenate(labels_list)  # host-side copies, no D2H
    preds = logits.argmax(-1)
    # softmax on host, f64 for a stable AUC
    z = logits.astype(np.float64) - logits.max(-1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    acc, bal, f1, auc = calculate_metrics(labels, preds, probs, num_classes)
    return float(losses.mean()), acc, bal, f1, auc


def run(cfg: TrainConfig) -> dict:
    """Train + evaluate; returns a result summary dict."""
    try:
        return _run(cfg)
    finally:
        # The mesh context is process-global (kanvit.parallel.runtime);
        # never leak it past this training run (in-process test callers).
        runtime.activate_mesh(None)


def _validate_config(cfg: TrainConfig) -> None:
    """Pure-config cross-flag validation, before any data/model work."""
    if cfg.n_pipe_stages <= 1 and cfg.n_microbatches:
        raise ValueError(
            "--n-microbatches requires --n-pipe-stages > 1 (no pipeline, "
            "no microbatching; use --grad-accum-steps to shrink activation "
            "memory without a pipeline)"
        )
    if cfg.ema_decay > 0 and cfg.update_grid_every > 0:
        raise ValueError(
            "--ema-decay with --update-grid-every: the grid refit rewrites "
            "params outside the optimizer, so the EMA shadow would keep "
            "STALE knot grids and evaluate mismatched spline coefficients"
        )
    if cfg.n_pipe_stages > 1 and cfg.n_model_shards > 1:
        from kanvit.parallel.pipeline import pp_tp_reason

        reason = pp_tp_reason(
            cfg.model_type, cfg.n_heads, cfg.d_hidden, cfg.n_model_shards
        )
        if reason:
            raise ValueError(
                f"--n-pipe-stages with --n-model-shards: {reason}"
            )


def _run(cfg: TrainConfig) -> dict:
    _validate_config(cfg)
    metrics_file = setup_logging(cfg.log_dir, dataset=cfg.dataset)
    log = logging.getLogger("kanvit.train")
    devices = jax.devices()
    log.info(
        "Using %d %s device(s): %s", len(devices), jax.default_backend(), devices
    )

    train_pipe, test_pipe, num_classes = build_pipelines(cfg)
    mcfg = _dataset_model_config(cfg.dataset)
    chw = tuple(train_pipe.images.shape[1:])
    steps_per_epoch = len(train_pipe)
    if cfg.limit_train_batches:
        steps_per_epoch = min(steps_per_epoch, cfg.limit_train_batches)
    total_steps = steps_per_epoch * cfg.epochs
    model, state = build_model_and_state(
        cfg, num_classes, chw, mcfg["n_patches"], total_steps=total_steps
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log.info("Model %s: %d parameters", cfg.model_type, n_params)

    # Mesh: DP over remaining devices, optional TP over n_model_shards,
    # optional PP over n_pipe_stages. Under jax.distributed (multi-host)
    # the same mesh spans all hosts' devices; each process feeds its slice
    # of the global batch.
    mesh = create_mesh(
        n_model=cfg.n_model_shards, n_pipe=cfg.n_pipe_stages
    )
    # Make every Pallas kernel entry mesh-aware (shard_map per shard —
    # the SPMD partitioner cannot shard custom calls); a 1-device mesh
    # deactivates and the single-chip fast paths run untouched.
    runtime.activate_mesh(mesh)
    use_pp = cfg.n_pipe_stages > 1
    n_micro = cfg.n_microbatches or cfg.n_pipe_stages
    if use_pp:
        from kanvit.parallel.pipeline import (
            create_pp_state,
            make_pp_eval_step,
            make_pp_train_step,
            pp_param_shardings,
        )

        if cfg.update_grid_every:
            raise ValueError(
                "--update-grid-every is not supported with pipeline "
                "parallelism (the grid refit operates on the canonical "
                "param layout)"
            )
        if cfg.grad_accum_steps > 1:
            raise ValueError(
                "--grad-accum-steps is redundant with pipeline "
                "parallelism — use --n-microbatches"
            )
        if cfg.batch_size % n_micro:
            raise ValueError(
                f"batch {cfg.batch_size} not divisible by "
                f"{n_micro} microbatches"
            )
        # Re-create the state in the pipeline layout (stacked blocks,
        # leading block axis sharded over 'pipe'); same seed, same values.
        state = create_pp_state(
            model, jax.random.PRNGKey(cfg.seed),
            jnp.zeros((1, *chw), jnp.float32), cfg.learning_rate,
            **_sched_kw(cfg, total_steps),
        )
        state = shard_state(
            state, mesh, p_shard=pp_param_shardings(state.params, mesh)
        )
    else:
        state = shard_state(state, mesh)
    data_shard = batch_sharding(mesh)
    multiproc = jax.process_count() > 1
    is_proc0 = jax.process_index() == 0
    replicate = None
    gather_state = None
    if multiproc:
        rep = NamedSharding(mesh, PartitionSpec())
        replicate = jax.jit(lambda a, b: (a, b), out_shardings=(rep, rep))
        if cfg.ckpt_dir:
            # Model-sharded params span hosts, so their shards are not all
            # addressable from proc 0 and a bare device_get would throw.
            # A jit identity with replicated out_shardings is an all-gather
            # every process participates in; proc 0 then reads its local
            # replica.
            gather_state = jax.jit(
                lambda s: s, out_shardings=jax.tree.map(lambda _: rep, state)
            )

    if cfg.resume and cfg.ckpt_dir:
        path = latest_checkpoint(cfg.ckpt_dir)
        if path:
            if use_pp:
                # Checkpoints are always canonical-layout (rule 6): restore
                # into a canonical template, then split into the pipeline
                # layout so a DP/TP run's checkpoint resumes under PP.
                from kanvit.parallel.pipeline import canonical_state_to_pp

                tmpl = create_train_state(
                    model, jax.random.PRNGKey(cfg.seed),
                    jnp.zeros((1, *chw), jnp.float32), cfg.learning_rate,
                    **_sched_kw(cfg, total_steps),
                )
                state = canonical_state_to_pp(
                    restore_checkpoint(path, tmpl), model.n_blocks
                )
                state = shard_state(
                    state, mesh,
                    p_shard=pp_param_shardings(state.params, mesh),
                )
            else:
                state = restore_checkpoint(path, state)
                # from_bytes leaves host numpy arrays in the tree; re-place
                # on the mesh so the .sharding reads below and the
                # AOT-compiled step see device arrays again.
                state = shard_state(state, mesh)
            log.info("Resumed from %s (step %d)", path, int(state.step))

    # Pin output shardings to the input layout: with donated buffers + AOT
    # compilation, XLA would otherwise re-choose output shardings and the
    # returned state would stop matching the executable's inputs.
    replicated = NamedSharding(mesh, PartitionSpec())
    state_shardings = jax.tree.map(lambda a: a.sharding, state)
    if use_pp:
        train_step = make_pp_train_step(
            model, mesh, n_micro, bf16=cfg.bf16,
            out_shardings=(state_shardings, replicated, data_shard),
        )
        eval_step = make_pp_eval_step(
            model, mesh, n_micro, bf16=cfg.bf16,
            out_shardings=(data_shard, data_shard), per_example=True,
        )
    else:
        if cfg.batch_size % max(cfg.grad_accum_steps, 1):
            raise ValueError(
                f"batch {cfg.batch_size} not divisible by "
                f"--grad-accum-steps {cfg.grad_accum_steps}"
            )
        train_step = make_train_step(
            bf16=cfg.bf16,
            out_shardings=(state_shardings, replicated, data_shard),
            grad_accum=cfg.grad_accum_steps,
        )
        eval_step = make_eval_step(
            bf16=cfg.bf16, out_shardings=(data_shard, data_shard),
            per_example=True,
        )

    def put(x):
        """Host batch -> mesh-sharded device array. ``cfg.batch_size`` is the
        GLOBAL batch; under multi-host each process extracts its slice of the
        (identically generated, same-seed) global batch."""
        if multiproc:
            per, off = process_batch_slice(len(x))
            return jax.make_array_from_process_local_data(
                data_shard, np.asarray(x)[off: off + per], x.shape
            )
        return jax.device_put(x, data_shard)

    # Compile ahead of the pipelined loop (compilation mid-epoch would
    # serialize against the in-flight H2D lookahead transfers).
    sample_x = put(np.zeros((cfg.batch_size, *chw), np.float32))
    sample_y = put(np.zeros((cfg.batch_size,), np.int32))
    t0 = time.perf_counter()
    train_step = train_step.lower(state, sample_x, sample_y).compile()
    eval_step = eval_step.lower(state, sample_x, sample_y).compile()
    log.info("compiled train/eval steps in %.1fs", time.perf_counter() - t0)

    update_grid = None
    if cfg.update_grid_every > 0:
        from kanvit.train.grid_update import make_update_grid_step

        update_grid = make_update_grid_step(
            model.apply, out_shardings=state_shardings
        )

    try:  # progress bars like the reference (train.py:26,31,64)
        from tqdm import tqdm, trange
    except ImportError:  # pragma: no cover
        tqdm = lambda it, **kw: it  # noqa: E731
        trange = range

    from kanvit.data.prefetch import lookahead, prefetch

    summary = {}
    total_images = 0
    global_step = 0
    train_t0 = time.perf_counter()
    for epoch in trange(cfg.epochs, desc="train"):
        losses, logit_buf, label_buf = [], [], []
        t0 = time.perf_counter()
        n_batches = 0

        # Host-side batch prep (augmentation) runs ahead in a thread;
        # optionally issue H2D transfers several batches ahead too. Host
        # label copies ride along so metrics never fetch them back.
        batches = prefetch(train_pipe)
        if cfg.h2d_lookahead > 0:
            batches = lookahead(
                batches, lambda b: (put(b[0]), put(b[1]), b[1]),
                cfg.h2d_lookahead,
            )
        else:
            batches = ((put(x), put(y), y) for x, y in batches)
        for bi, (x, y, y_host) in enumerate(
            tqdm(batches, desc=f"Epoch {epoch + 1} in training",
                 total=len(train_pipe), leave=False)
        ):
            if cfg.limit_train_batches and bi >= cfg.limit_train_batches:
                break
            if (
                update_grid is not None
                and global_step % cfg.update_grid_every == 0
            ):
                state = update_grid(state, x)
            global_step += 1
            state, loss, logits = train_step(state, x, y)
            losses.append(loss)
            logit_buf.append(logits)
            label_buf.append(y_host)
            n_batches += 1
        if losses:
            float(losses[-1])  # hard sync (block_until_ready can lie on
            # tunneled transports); one scalar D2H per epoch
        dt = time.perf_counter() - t0
        images = n_batches * cfg.batch_size
        total_images += images

        loss, acc, bal, f1, auc = _epoch_metrics(
            losses, logit_buf, label_buf, num_classes, replicate
        )
        log.info("Epoch %d/%d", epoch + 1, cfg.epochs)
        log.info("  Train Loss: %.4f", loss)
        log.info("  Train Accuracy: %.4f", acc)
        log.info("  Train Balanced Accuracy: %.4f", bal)
        log.info("  Train F1 Score: %.4f", f1)
        log.info("  Train ROC AUC: %.4f", auc)
        log.info(
            "  Throughput: %.1f images/sec (%.1f steps/sec, %d devices)",
            images / dt, n_batches / dt, len(devices),
        )
        summary.update(
            train_loss=loss, train_accuracy=acc, images_per_sec=images / dt
        )

        if epoch == cfg.epochs - 1 and is_proc0:
            save_metrics(
                metrics_file, epoch + 1, "Train", loss, acc, bal, f1, auc, flag=0
            )
        if cfg.ckpt_dir:
            to_save = state if gather_state is None else gather_state(state)
            if is_proc0:
                host_state = jax.device_get(to_save)
                if use_pp:
                    # Persist in the canonical layout (rule 6): layout-
                    # independent checkpoints, resumable under DP/TP.
                    from kanvit.parallel.pipeline import pp_state_to_canonical

                    host_state = pp_state_to_canonical(
                        host_state, model.n_blocks
                    )
                save_checkpoint(
                    cfg.ckpt_dir, host_state, int(state.step)
                )

    summary["train_time_sec"] = time.perf_counter() - train_t0
    summary["total_train_images"] = total_images

    # Test pass (reference train.py:58-84). With --ema-decay the test pass
    # evaluates the EMA shadow params (torch AveragedModel-style): same
    # state structure, so the AOT-compiled eval program is reused as-is.
    eval_state = state
    if cfg.ema_decay > 0:
        from kanvit.train.state import ema_params

        ep = ema_params(state)
        if ep is not None:
            eval_state = state.replace(params=ep)
            log.info("Evaluating with EMA params (decay %.4g)", cfg.ema_decay)
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)
    def _pad_tail(batch):
        x, y = batch
        n_valid = len(y)
        if n_valid < cfg.batch_size:  # pad the tail batch, slice back below
            pad = cfg.batch_size - n_valid
            x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)])
            y_in = np.concatenate([y, np.zeros(pad, y.dtype)])
        else:
            y_in = y
        return x, y_in, y, n_valid

    # Same host-side pipelining as the train pass: batch prep runs ahead in
    # a thread; H2D transfers optionally ride the lookahead window.
    eval_batches = prefetch(map(_pad_tail, test_pipe))
    if cfg.h2d_lookahead > 0:
        eval_batches = lookahead(
            eval_batches, lambda b: (put(b[0]), put(b[1]), b[2], b[3]),
            cfg.h2d_lookahead,
        )
    else:
        eval_batches = (
            (put(x), put(y_in), y, nv) for x, y_in, y, nv in eval_batches
        )
    losses, logit_buf, label_buf = [], [], []
    for bi, (x, y_in, y, n_valid) in enumerate(
        tqdm(eval_batches, desc="Testing", total=len(test_pipe))
    ):
        if cfg.limit_eval_batches and bi >= cfg.limit_eval_batches:
            break
        loss_vec, logits = eval_step(eval_state, x, y_in)
        losses.append(loss_vec[:n_valid])
        logit_buf.append(logits[:n_valid])
        label_buf.append(y)  # host array from the pipeline
    if losses:
        loss, acc, bal, f1, auc = _epoch_metrics(
            losses, logit_buf, label_buf, num_classes, replicate
        )
        log.info("Test Results:")
        log.info("  Test Loss: %.4f", loss)
        log.info("  Test Accuracy: %.4f", acc)
        log.info("  Test Balanced Accuracy: %.4f", bal)
        log.info("  Test F1 Score: %.4f", f1)
        log.info("  Test ROC AUC: %.4f", auc)
        if is_proc0:
            save_metrics(
                metrics_file, cfg.epochs, "Test", loss, acc, bal, f1, auc, flag=1
            )
        summary.update(test_loss=loss, test_accuracy=acc)
    if cfg.profile_dir:
        jax.profiler.stop_trace()

    return summary
