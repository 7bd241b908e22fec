"""Benchmark harness — prints ONE JSON line for the driver.

Measures steady-state training throughput (images/sec/chip) of the flagship
EfficientKAN-ViT in the reference's MNIST ctor configuration
(``model.py:49``: 4 blocks, d=64, 2 heads, 7x7 patches, 10 classes) with the
reference's training schedule (Adam, CE, batch 128 — ``train.py:22-23,88-90``)
on synthetic MNIST-shaped data.

``vs_baseline`` is the ratio against the executed PyTorch reference measured
on this host (benchmarks/reference_baseline.json — the reference publishes
no numbers, SURVEY §6).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


# Model geometry presets: "reference" is the reference's MNIST ctor config
# (model.py:49); "vit-s" is a production-scale stress config (ViT-Small-ish,
# 196 tokens, d=384) far beyond anything the reference can express.
PRESETS = {
    "reference": dict(chw=(1, 28, 28), n_patches=7, n_blocks=4,
                      d_hidden=64, n_heads=2, out_d=10),
    "vit-s": dict(chw=(3, 224, 224), n_patches=14, n_blocks=12,
                  d_hidden=384, n_heads=6, out_d=1000),
    "vit-b": dict(chw=(3, 224, 224), n_patches=14, n_blocks=12,
                  d_hidden=768, n_heads=12, out_d=1000),
    "vit-l": dict(chw=(3, 224, 224), n_patches=14, n_blocks=24,
                  d_hidden=1024, n_heads=16, out_d=1000),
}

# Per-chip peak matmul throughput (bf16 FLOP/s) by device kind, for the MFU
# figure. MFU is always reported against the bf16 MXU peak — the standard
# convention — so f32 runs show correspondingly lower utilization.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "cpu": 1e12,             # nominal, keeps the field defined in CI
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "cpu")
    for key, val in PEAK_FLOPS.items():
        if kind.startswith(key):
            return val
    return None


def _analytic_flops(model_type: str, geom: dict, batch: int) -> float:
    """Useful model FLOPs per training step (fwd + bwd), analytic.

    XLA's ``cost_analysis`` cannot see inside Pallas custom calls, so it
    under-counts exactly the ops this framework moves into kernels; MFU is
    therefore computed from this analytic count of the *model's* math (the
    standard MFU convention — implementation overheads like basis
    recomputation or padding don't inflate it).

    Per-variant KAN layer cost: a ``nin -> nout`` layer contracts an
    ``(E + base) * nin``-wide basis (E = basis functions per input feature,
    base = 1 when a silu base branch exists) against the weight:
    ``2 * rows * (E+base) * nin * nout`` FLOPs. Constants follow the
    call-site parity values (mapper sine/fourier grid 28, cheby degree 4,
    KANLinear grid 5 + order 3, FastKAN 8 RBF grids, sine grid 4 in MSA).
    Backward of every matmul costs 2x its forward.
    """
    c, h, w = geom["chw"]
    n_p, L = geom["n_patches"], geom["n_blocks"]
    d, n_heads, out_d = geom["d_hidden"], geom["n_heads"], geom["out_d"]
    t = n_p * n_p + 1
    rows_embed = batch * (t - 1)
    rows_tok = batch * t
    d_head = d // n_heads
    patch_dim = c * (h // n_p) * (w // n_p)

    def kan(rows, nin, nout, in_msa):
        if model_type in ("vanilla", "flash-attn") or (
            model_type == "fourier" and in_msa
        ):
            e = 1.0
        elif model_type == "efficientkan":
            e = 8 + 1  # grid 5 + order 3 splines, + silu base branch
        elif model_type == "fast":
            e = 8 + 1  # 8 RBF grids + silu base branch
        elif model_type == "sine":
            e = 4.0 if in_msa else 28.0
        elif model_type == "fourier":
            e = 2 * 28.0  # cos + sin harmonics
        elif model_type == "cheby":
            e = 5.0  # degree 4 -> T_0..T_4
        else:
            e = 1.0
        return 2.0 * rows * e * nin * nout

    fwd = kan(rows_embed, patch_dim, d, in_msa=False)  # patch embedder
    if model_type == "flash-attn":
        # Raw flash blocks: to_q (d->d), to_kv (d->2d), to_out (d->d).
        per_block = 2.0 * rows_tok * d * 4 * d
        per_block += 2.0 * 2 * batch * n_heads * t * t * d_head
        fwd += L * per_block
    else:
        per_block = 3 * n_heads * kan(rows_tok, d_head, d_head, in_msa=True)
        per_block += 2.0 * 2 * batch * n_heads * t * t * d_head  # qk^T, pv
        per_block += 2.0 * 2 * rows_tok * d * 4 * d  # FF pair
        fwd += L * per_block
    fwd += 2.0 * batch * d * out_d  # mlp head
    return 3.0 * fwd  # + backward at 2x forward


# The scanned measurement path stacks one batch per step; cap the stack's
# HBM footprint (large presets have 100ms+ steps where per-call dispatch is
# noise anyway, and their stacks would not fit).
_SCAN_STACK_BUDGET = 2 << 30


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-type", default="efficientkan")
    p.add_argument("--preset", default="reference", choices=sorted(PRESETS))
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=50,
                   help="steps per timed window")
    p.add_argument("--windows", type=int, default=5,
                   help="repeated timed windows; the MEDIAN is reported")
    p.add_argument("--warmup", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="gradient rematerialization (memory for FLOPs)")
    p.add_argument("--no-scan", action="store_true",
                   help="force the per-step dispatch path")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="accumulate gradients over this many batch chunks "
                        "(per-step path; same update, chunked activations)")
    args = p.parse_args()

    from kanvit.models import create_model
    from kanvit.train.state import create_train_state
    from kanvit.train.steps import make_train_scan, make_train_step

    geom = PRESETS[args.preset]
    model = create_model(args.model_type, remat=args.remat, **geom)
    chw = geom["chw"]
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, *chw)))

    # Per-step dispatch costs milliseconds (and varies day to day) on a
    # tunneled device transport — at the tiny reference config it swamps the
    # ~1.5 ms of device work per step. The scanned path runs the whole
    # window as ONE device program (lax.scan over stacked batches), so the
    # measurement is device throughput, not host/tunnel latency.
    stack_bytes = args.steps * args.batch_size * (
        4 * int(jnp.prod(jnp.array(chw))) + 4
    )
    use_scan = (not args.no_scan and args.grad_accum <= 1
                and stack_bytes <= _SCAN_STACK_BUDGET)
    if use_scan:
        xs = jax.random.normal(
            jax.random.PRNGKey(1), (args.steps, args.batch_size, *chw)
        )
        ys = jax.random.randint(
            jax.random.PRNGKey(2), (args.steps, args.batch_size), 0,
            geom["out_d"],
        )
        step = make_train_scan(bf16=args.bf16)
        step = step.lower(state, xs, ys).compile()
        run_window = lambda st: step(st, xs, ys)  # noqa: E731
    else:
        x = jax.random.normal(jax.random.PRNGKey(1), (args.batch_size, *chw))
        y = jax.random.randint(
            jax.random.PRNGKey(2), (args.batch_size,), 0, geom["out_d"]
        )
        step = make_train_step(bf16=args.bf16, grad_accum=args.grad_accum)
        step = step.lower(state, x, y).compile()

        def run_window(st):
            for _ in range(args.steps):
                st, loss, logits = step(st, x, y)
            return st, loss, logits

    # XLA's own FLOP count for the whole fused program (fwd + CE + bwd +
    # Adam) — reported alongside the analytic model-FLOPs figure that MFU is
    # based on.
    flops = None
    try:
        ca = step.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        # XLA counts a while/scan body ONCE (no trip-count multiply), so the
        # scanned program's figure is already per-step.
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    def hard_sync(loss):
        # One scalar D2H — block_until_ready can return early on tunneled
        # transports, silently under-measuring step time.
        float(loss[-1] if getattr(loss, "ndim", 0) else loss)

    state, loss, _ = run_window(state)  # warmup: compile-adjacent first run
    hard_sync(loss)

    window_s = []
    for _ in range(max(1, args.windows)):
        t0 = time.perf_counter()
        state, loss, _ = run_window(state)
        hard_sync(loss)
        window_s.append(time.perf_counter() - t0)
    window_s.sort()
    dt = window_s[len(window_s) // 2]  # median window

    n_chips = jax.device_count()
    ips = args.batch_size * args.steps / dt / n_chips
    step_ms = dt / args.steps * 1000

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "reference_baseline.json",
    )
    vs = None
    if args.preset == "reference" and os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)["images_per_sec"].get(args.model_type)
        if ref:
            vs = round(ips / ref, 2)

    peak = _peak_flops(jax.devices()[0])
    flops_model = _analytic_flops(args.model_type, geom, args.batch_size)
    mfu = None
    if flops_model and peak:
        mfu = round(flops_model / (step_ms / 1000) / (peak * n_chips), 4)
    mfu_xla = None
    if flops and peak:
        mfu_xla = round(flops / (step_ms / 1000) / (peak * n_chips), 4)

    name = "mnist" if args.preset == "reference" else args.preset
    print(json.dumps({
        "metric": f"{name}_{args.model_type}_train_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": vs,
        "step_time_ms": round(step_ms, 2),
        "step_time_ms_minmax": [
            round(window_s[0] / args.steps * 1000, 2),
            round(window_s[-1] / args.steps * 1000, 2),
        ],
        "windows": len(window_s),
        "steps_per_call": args.steps if use_scan else 1,
        "batch_size": args.batch_size,
        "grad_accum": args.grad_accum,
        "device": str(jax.devices()[0]),
        "bf16": args.bf16,
        "flops_per_step": flops_model,
        "mfu": mfu,
        "flops_per_step_xla": flops,   # HLO-visible only (excludes Pallas)
        "mfu_xla": mfu_xla,
        "peak_flops_bf16": peak,
    }))


if __name__ == "__main__":
    main()
