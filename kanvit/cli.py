"""CLI mirroring the reference trainer's argparse surface.

Reference flags and defaults (``train.py:86-97``) are preserved verbatim;
kanvit adds dataset selection (resolving the README-vs-code MNIST/CIFAR
mismatch, SURVEY §2.9.3), seeding, bf16, checkpoint/resume, tensor-parallel
shard count, and profiling — capabilities the reference lacks.
"""

from __future__ import annotations

import argparse

from kanvit.train.loop import TrainConfig, run


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Benchmark KAN Vision Transformers (TPU-native)"
    )
    # Reference surface (train.py:86-97), same names and defaults.
    p.add_argument("--epochs", type=int, default=20, help="number of epochs to train")
    p.add_argument("--batch-size", type=int, default=128, help="batch size for training")
    p.add_argument("--learning-rate", type=float, default=0.001, help="learning rate for optimizer")
    p.add_argument("--model-type", type=str, default="vanilla",
                   help="variant: vanilla|efficientkan|fast|sine|fourier|cheby|flash-attn")
    p.add_argument("--n-blocks", type=int, default=8, help="number of transformer blocks")
    p.add_argument("--d-hidden", type=int, default=64, help="hidden dimension of transformer block")
    p.add_argument("--n-heads", type=int, default=8, help="number of attention heads")
    p.add_argument("--log-dir", type=str, default="logs", help="directory to store logs")
    p.add_argument("--device", type=str, default=None,
                   help="backend to use (tpu/cpu); default: auto-select "
                        "(mirrors the reference's --device flag)")
    # kanvit extensions
    p.add_argument("--dataset", type=str, default="cifar100",
                   choices=("mnist", "cifar100", "digits", "synthetic"))
    p.add_argument("--lr-schedule", type=str, default="constant",
                   choices=("constant", "cosine"),
                   help="LR schedule: constant (optional --warmup-steps) or "
                        "cosine (warmup then cosine decay to 0 over the run)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear LR warmup steps from 0 to --learning-rate")
    p.add_argument("--weight-decay", type=float, default=0.0,
                   help="AdamW decoupled weight decay (0 = plain Adam, "
                        "the reference optimizer)")
    p.add_argument("--clip-grad-norm", type=float, default=0.0,
                   help="clip gradients by global norm before Adam (0 = off)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="exponential moving average of params (e.g. 0.999); "
                        "the test pass evaluates the EMA weights (0 = off)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute policy")
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--n-model-shards", type=int, default=1,
                   help="tensor-parallel shards (devices split as data x model x pipe)")
    p.add_argument("--n-pipe-stages", type=int, default=1,
                   help="pipeline-parallel stages (blocks sharded over the "
                        "'pipe' mesh axis; composes with DP, not TP)")
    p.add_argument("--n-microbatches", type=int, default=0,
                   help="pipeline microbatches per step (0 = one per stage)")
    p.add_argument("--grad-accum-steps", type=int, default=1,
                   help="split each batch into this many chunks, accumulate "
                        "gradients, apply one optimizer update (activation "
                        "memory drops to one chunk; not with pipeline "
                        "parallelism, which microbatches already)")
    # Multi-host (jax.distributed): DP laid across hosts over DCN. With no
    # flags set this is a no-op (single-process). On TPU pods the
    # coordinator/process args are usually auto-detected — pass
    # --num-processes alone to trigger env-based initialization.
    p.add_argument("--coordinator-address", type=str, default=None,
                   help="multi-host coordinator, e.g. 10.0.0.1:1234")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace of the test pass here")
    p.add_argument("--h2d-lookahead", type=int, default=0,
                   help="pipeline H2D transfers N batches ahead (0=off)")
    p.add_argument("--limit-train-batches", type=int, default=None)
    p.add_argument("--limit-eval-batches", type=int, default=None)
    p.add_argument("--update-grid-every", type=int, default=0,
                   help="refit B-spline knot grids from live activations "
                        "every N steps (efficientkan; 0=off)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    from kanvit.parallel.distributed import initialize_distributed

    initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
        try:
            jax.devices()
        except RuntimeError:
            # The requested name may be served by a differently-named
            # plugin (e.g. 'tpu' behind the 'axon' tunnel on dev hosts):
            # fall back to the ambient default backend rather than failing.
            jax.config.update("jax_platforms", None)
            print(
                f"--device {args.device}: no such platform here; using "
                f"default backend {jax.default_backend()!r}"
            )
    cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm,
        ema_decay=args.ema_decay,
        model_type=args.model_type,
        n_blocks=args.n_blocks,
        d_hidden=args.d_hidden,
        n_heads=args.n_heads,
        log_dir=args.log_dir,
        dataset=args.dataset,
        data_dir=args.data_dir,
        seed=args.seed,
        bf16=args.bf16,
        ckpt_dir=args.ckpt_dir,
        resume=args.resume,
        n_model_shards=args.n_model_shards,
        n_pipe_stages=args.n_pipe_stages,
        n_microbatches=args.n_microbatches,
        grad_accum_steps=args.grad_accum_steps,
        profile_dir=args.profile_dir,
        h2d_lookahead=args.h2d_lookahead,
        limit_train_batches=args.limit_train_batches,
        limit_eval_batches=args.limit_eval_batches,
        update_grid_every=args.update_grid_every,
    )
    return run(cfg)


if __name__ == "__main__":
    main()
