"""Decoder-regime (causal, long-seq) benchmark through FlashAttentionBlock.

Round-1 gap: the flash kernel's causal path was only exercised at the kernel
level. This drives it END-TO-END in a model: a decoder-style stack of causal
``FlashAttentionBlock``s (the reference's module with ``causal=True`` — its
own causal path, ``utils.py:192-195``, is never exercised by any reference
caller) trained with a full fwd+CE+bwd+Adam step on long sequences.

Compares the Pallas flash path against the naive XLA attention fallback
(``KANVIT_IMPL=jnp``) where the latter fits memory. Writes
benchmarks/causal_decoder.json and prints one JSON line per config.

Usage: python benchmarks/causal_decoder.py [--seqs 2048 8192] [--steps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_model(dim, heads, n_blocks, vocab, seq_axis=None):
    from kanvit.models import CausalDecoder

    return CausalDecoder(vocab=vocab, dim=dim, heads=heads,
                         n_blocks=n_blocks, seq_axis=seq_axis)


def bench_config(seq, batch, dim, heads, n_blocks, vocab, steps, warmup, impl,
                 bf16=False, ring=0):
    import contextlib

    import jax
    import jax.numpy as jnp
    import optax

    from kanvit.ops import dispatch

    dispatch.set_impl(impl)
    mesh_ctx = contextlib.nullcontext()
    if ring:
        # Sequence parallelism: T sharded `ring`-way over the mesh's 'data'
        # axis, ring attention inside every block (k/v chunks rotate via
        # ppermute). Needs `ring` JAX devices — on the single-chip axon host
        # run under a simulated CPU mesh:
        #   JAX_PLATFORM_NAME=cpu \
        #   XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        #   python benchmarks/causal_decoder.py --ring 8 --seqs 8192
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from kanvit.parallel import runtime
        from kanvit.parallel.mesh import create_mesh

        mesh = create_mesh(n_data=ring, devices=jax.devices()[:ring])
        mesh_ctx = runtime.mesh_active(mesh)
    model = build_model(dim, heads, n_blocks, vocab,
                        seq_axis="data" if ring else None)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 0, vocab)
    if ring:
        tokens = jax.device_put(tokens, NamedSharding(mesh, PS(None, "data")))
    params = model.init(rng, tokens)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, toks):
        if bf16:  # bf16 compute / f32 master params (the trainer's policy)
            p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p,
            )
        logits = model.apply({"params": p}, toks)
        # next-token CE (decoder objective)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1].astype(jnp.float32), toks[:, 1:]
        ).mean()

    @jax.jit
    def step(p, o, toks):
        loss, grads = jax.value_and_grad(loss_fn)(p, toks)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    with mesh_ctx:
        for _ in range(warmup):
            params, opt_state, loss = step(params, opt_state, tokens)
        loss_val = float(loss)  # hard sync
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, tokens)
        float(loss)
        dt = time.perf_counter() - t0
    step_ms = dt / steps * 1000
    tok_s = batch * seq * steps / dt
    return dict(seq=seq, batch=batch, impl=impl, bf16=bf16, ring=ring,
                step_ms=round(step_ms, 2),
                tokens_per_sec=round(tok_s, 0), loss=round(loss_val, 4))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", type=int, nargs="+", default=[2048, 8192])
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--n-blocks", type=int, default=4)
    p.add_argument("--vocab", type=int, default=1024)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--tokens-per-batch", type=int, default=2 ** 15,
                   help="batch = tokens_per_batch // seq (>=1)")
    p.add_argument("--skip-naive", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--ring", type=int, default=0,
                   help="shard T this many ways over a mesh and use ring "
                        "attention (sequence parallelism); needs that many "
                        "JAX devices — simulate with JAX_PLATFORM_NAME=cpu "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N")
    args = p.parse_args()

    results = []
    for seq in args.seqs:
        batch = max(1, args.tokens_per_batch // seq)
        impls = ["pallas"] if args.skip_naive else ["pallas", "jnp"]
        if args.ring:
            # Ring attention is its own implementation (einsum chunk folds
            # inside shard_map); one run suffices, and on a simulated CPU
            # mesh the Pallas kernels are unavailable anyway.
            impls = ["auto"]
        for impl in impls:
            try:
                r = bench_config(seq, batch, args.dim, args.heads,
                                 args.n_blocks, args.vocab, args.steps,
                                 args.warmup, impl, args.bf16, args.ring)
            except Exception as e:  # naive path OOMs at long seq — record it
                r = dict(seq=seq, batch=batch, impl=impl,
                         error=type(e).__name__, detail=str(e)[:200])
            print(json.dumps(r), flush=True)
            results.append(r)

    out = {
        "model": f"causal decoder: {args.n_blocks} FlashAttentionBlocks "
                 f"(causal=True), d={args.dim}, {args.heads} heads, "
                 f"vocab {args.vocab}, next-token CE + Adam",
        "results": results,
    }
    name = "causal_decoder_bf16.json" if args.bf16 else "causal_decoder.json"
    if args.ring:  # never clobber the single-chip numbers with a ring run
        name = f"causal_decoder_ring{args.ring}.json"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
