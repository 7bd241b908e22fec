"""A/B the ViT-S MSA hotspots on TPU with unchained timing.

(1) shared-basis qkv projection fwd+bwd: row-packing on vs off
    (KANVIT_PACK env; needs two separate process runs since the flag is
    read at trace time — pass --pack 0/1).
(2) attention core fwd+bwd at T=197: batched einsum (current dispatch)
    vs the Pallas flash kernel (bf16 dots), to see whether the short-seq
    threshold should drop.

Timing: dispatch N steps without chaining, block once at the end
(CLAUDE.md measured-facts methodology).

Usage: python tools/tpu_probe_qkv_ab.py [--pack 0|1] [--what qkv|attn|all]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

p = argparse.ArgumentParser()
p.add_argument("--pack", default="1")
p.add_argument("--what", default="all")
p.add_argument("--steps", type=int, default=30)
args = p.parse_args()
os.environ["KANVIT_PACK"] = args.pack

import jax
import jax.numpy as jnp

B, T, D, H = 256, 197, 384, 6
DH = D // H
DT = jnp.bfloat16


def timeit(fn, *fargs, steps=30, warmup=3):
    for _ in range(warmup):
        out = fn(*fargs)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])  # hard sync
    t0 = time.perf_counter()
    outs = [fn(*fargs) for _ in range(steps)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}  pack={args.pack}", flush=True)
    key = jax.random.PRNGKey(0)

    if args.what in ("qkv", "all"):
        from kanvit.layers.attention import MSA, _shared_basis_qkv

        x = (jax.random.normal(key, (B, T, D)) * 0.5).astype(DT)
        msa = MSA(d=D, n_heads=H, type="efficientkan")
        params = jax.tree.map(
            lambda a: a.astype(DT),
            msa.init(jax.random.PRNGKey(1), x)["params"],
        )
        xh = jnp.moveaxis(x.reshape(B, T, H, DH), 2, 0)

        @jax.jit
        def qkv(p, xh):
            def loss(p):
                q, k, v = _shared_basis_qkv(
                    "efficientkan", xh, DH,
                    p["q_mappings"], p["k_mappings"], p["v_mappings"],
                )
                return sum((t.astype(jnp.float32) ** 2).mean() for t in (q, k, v))
            return jax.value_and_grad(loss)(p)

        print(f"qkv fwd+bwd (pack={args.pack}): {timeit(qkv, params, xh, steps=args.steps):7.2f} ms", flush=True)

        @jax.jit
        def full(p, x):
            def loss(p):
                return (msa.apply({"params": p}, x).astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(loss)(p)

        print(f"full MSA fwd+bwd (pack={args.pack}): {timeit(full, params, x, steps=args.steps):7.2f} ms", flush=True)

    if args.what in ("attn", "all"):
        from kanvit.kernels.flash_attention import flash_attention
        from kanvit.ops.attention import multi_head_attention

        kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
        q = (jax.random.normal(kq, (B, H, T, DH)) * 0.3).astype(DT)
        k = (jax.random.normal(kk, (B, H, T, DH)) * 0.3).astype(DT)
        v = (jax.random.normal(kv, (B, H, T, DH)) * 0.3).astype(DT)

        @jax.jit
        def einsum_attn(q, k, v):
            def loss(q, k, v):
                return (multi_head_attention(q, k, v).astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

        print(f"attn einsum fwd+bwd:      {timeit(einsum_attn, q, k, v, steps=args.steps):7.2f} ms", flush=True)

        @jax.jit
        def flash_attn(q, k, v):
            def loss(q, k, v):
                o = flash_attention(q, k, v, False, 256, 256)
                return (o.astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

        print(f"attn flash  fwd+bwd:      {timeit(flash_attn, q, k, v, steps=args.steps):7.2f} ms", flush=True)


main()
