"""Where does a ViT-S variant's step spend its time?

Times fwd+bwd of each component at the ViT-S preset's shapes (batch 256,
196+1 tokens, d=384, 6 heads, bf16) in isolation: the variant's patch
embedder (768 -> 384 on ~50k rows, mapper-scale grid constants per
reference model.py:67-80), one TransformerBlock (MSA with per-head KAN
q/k/v, FF pair), and the full model step, under both the Pallas dispatch
and the forced-jnp path where it fits. Guides kernel optimization.

Usage: python benchmarks/vits_breakdown.py [--batch 256] [--variant sine]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, *args, steps=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    loss = jax.tree.leaves(out)[0]
    float(np.asarray(loss).ravel()[0])  # hard sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    loss = jax.tree.leaves(out)[0]
    float(np.asarray(loss).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1000  # ms


def chain_timer(loss, p, x, steps=20, warmup=2, reps=3):
    """Device-resident component timing: ``steps`` fwd+bwd iterations
    chained through a lax.scan carry inside ONE jit program. Per-call
    dispatch on the tunneled transport costs ~2.9 ms (measured: an (8,128)
    add "takes" 2.93 ms per dispatched call) — per-call timing overstates
    every small component by that much, which mis-ranks optimization
    targets. The carry perturbs x so XLA cannot hoist or CSE iterations;
    a grad-norm term keeps the backward alive."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(p, x):
        def body(c, _):
            l, g = jax.value_and_grad(loss)(p, x, c)
            gs = sum(jnp.sum(t.astype(jnp.float32) ** 2)
                     for t in jax.tree.leaves(g))
            return c + (l.astype(jnp.float32) + gs) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    for _ in range(warmup):
        out = run(p, x)
    float(np.asarray(out))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(p, x)
        float(np.asarray(out))
        best.append((time.perf_counter() - t0) / steps * 1000)
    return sorted(best)[len(best) // 2]  # median of reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--impls", nargs="+", default=["auto"])
    p.add_argument("--variant", default="efficientkan")
    p.add_argument("--skip-full", action="store_true")
    p.add_argument("--d", type=int, default=384,
                   help="model width (384 = ViT-S, 768 = ViT-B)")
    p.add_argument("--heads", type=int, default=6,
                   help="attention heads (6 = ViT-S, 12 = ViT-B)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from kanvit.layers.kan import make_kan_layer
    from kanvit.layers.transformer import TransformerBlock
    from kanvit.ops import dispatch

    results = {}
    B, T, D, H = args.batch, 197, args.d, args.heads
    N_emb = args.batch * 196
    dt = jnp.bfloat16 if args.bf16 else jnp.float32

    for impl in args.impls:
        dispatch.set_impl(impl)
        rec = {}

        # --- patch embedder: 768 -> 384 on N_emb rows, mapper grid consts
        emb = make_kan_layer(args.variant, 768, D, sine_grid_size=28,
                             fourier_grid_size=28, cheby_degree=4)
        x_emb = jax.random.normal(jax.random.PRNGKey(0), (N_emb, 768), dt)
        p_emb = emb.init(jax.random.PRNGKey(1), x_emb)["params"]
        p_emb = jax.tree.map(lambda a: a.astype(dt), p_emb)

        def emb_loss(p, x, c):
            x = (x * (1 + c * 1e-12)).astype(x.dtype)
            return (emb.apply({"params": p}, x).astype(jnp.float32) ** 2).mean()

        rec["embedder_fwd_bwd_ms"] = round(
            chain_timer(emb_loss, p_emb, x_emb, steps=args.steps), 2)

        # --- MSA alone (per-head KAN q/k/v + attention, no FF)
        from kanvit.layers.attention import MSA

        msa = MSA(d=D, n_heads=H, type=args.variant)
        x_msa = jax.random.normal(jax.random.PRNGKey(7), (B, T, D), dt)
        p_msa = jax.tree.map(
            lambda a: a.astype(dt),
            msa.init(jax.random.PRNGKey(8), x_msa)["params"],
        )

        def msa_loss(p, x, c):
            x = (x * (1 + c * 1e-12)).astype(x.dtype)
            return (msa.apply({"params": p}, x).astype(jnp.float32) ** 2).mean()

        rec["msa_fwd_bwd_ms"] = round(
            chain_timer(msa_loss, p_msa, x_msa, steps=args.steps), 2)

        # --- FF pair alone (Linear 384 -> 1536 -> 384 + ReLU)
        from kanvit.layers.kan import TorchLinear

        class FF(__import__("flax").linen.Module):
            @__import__("flax").linen.compact
            def __call__(self, x):
                h = TorchLinear(D, 4 * D, name="fc1")(x)
                return TorchLinear(4 * D, D, name="fc2")(jax.nn.relu(h))

        ff = FF()
        p_ff = jax.tree.map(
            lambda a: a.astype(dt),
            ff.init(jax.random.PRNGKey(9), x_msa)["params"],
        )

        def ff_loss(p, x, c):
            x = (x * (1 + c * 1e-12)).astype(x.dtype)
            return (ff.apply({"params": p}, x).astype(jnp.float32) ** 2).mean()

        rec["ff_fwd_bwd_ms"] = round(
            chain_timer(ff_loss, p_ff, x_msa, steps=args.steps), 2)

        # --- one transformer block (MSA + FF) at (B, T, D)
        blk = TransformerBlock(d_model=D, n_heads=H, feedforward_dim=4 * D,
                               attn_type=args.variant)
        x_blk = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), dt)
        p_blk = blk.init(jax.random.PRNGKey(3), x_blk)["params"]
        p_blk = jax.tree.map(lambda a: a.astype(dt), p_blk)

        def blk_loss(p, x, c):
            x = (x * (1 + c * 1e-12)).astype(x.dtype)
            return (blk.apply({"params": p}, x).astype(jnp.float32) ** 2).mean()

        rec["block_fwd_bwd_ms"] = round(
            chain_timer(blk_loss, p_blk, x_blk, steps=args.steps), 2)
        rec["blocks_total_ms"] = round(12 * rec["block_fwd_bwd_ms"], 1)

        if args.skip_full:
            results[impl] = rec
            print(json.dumps({impl: rec}), flush=True)
            continue

        # --- full model train step (same as bench.py vit-s preset)
        from kanvit.models import create_model
        from kanvit.train.state import create_train_state
        from kanvit.train.steps import make_train_step

        model = create_model(args.variant, chw=(3, 224, 224), n_patches=14,
                             n_blocks=12, d_hidden=D, n_heads=H, out_d=1000)
        state = create_train_state(
            model, jax.random.PRNGKey(4), jnp.zeros((1, 3, 224, 224))
        )
        step = make_train_step(bf16=args.bf16, donate=False)
        x = jax.random.normal(jax.random.PRNGKey(5), (B, 3, 224, 224))
        y = jax.random.randint(jax.random.PRNGKey(6), (B,), 0, 1000)
        rec["full_step_ms"] = round(
            timeit(lambda s, x, y: step(s, x, y)[1], state, x, y,
                   steps=args.steps), 2,
        )
        results[impl] = rec
        print(json.dumps({impl: rec}), flush=True)

    suffix = "" if args.variant == "efficientkan" else f"_{args.variant}"
    if (D, H) != (384, 6):
        suffix += f"_d{D}h{H}"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"vits_breakdown{suffix}.json")
    with open(path, "w") as f:
        json.dump({"batch": B, "bf16": args.bf16, "variant": args.variant,
                   "results": results}, f,
                  indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
