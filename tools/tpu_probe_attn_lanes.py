"""Isolated cost of the lanes-layout single-tile attention at the ViT-S
MSA shape (B=256, T=197, D=384, H=6, bf16): fwd and fwd+bwd vs the XLA
fused attention on the same lanes layout (transposes included, as MSA
would pay them) — and the roofline (dots ~0.3 ms, HBM ~0.6 ms) to see how
much of the cost is per-program overhead.

Usage: python tools/tpu_probe_attn_lanes.py [--batch 256]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.kernels import flash_attention as FA
from kanvit.ops.attention import multi_head_attention

DT = jnp.bfloat16


def timeit(fn, *args, steps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seq", type=int, default=197)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--dh", type=int, default=64)
    args = p.parse_args()
    b, t, h, dh = args.batch, args.seq, args.heads, args.dh
    d = h * dh
    print(f"devices: {jax.devices()}  shape B={b} T={t} H={h} dh={dh}",
          flush=True)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, d), DT)
    k = jax.random.normal(kk, (b, t, d), DT)
    v = jax.random.normal(kv, (b, t, d), DT)
    g = jnp.ones((b, t, d), DT)

    def sc(x):
        return jnp.sum(x.astype(jnp.float32))

    lanes_f = jax.jit(lambda q, k, v: sc(FA.flash_attention_lanes(q, k, v, h)))
    print(f"lanes fwd:        {timeit(lanes_f, q, k, v):7.2f} ms", flush=True)

    def lanes_loss(q, k, v):
        return (FA.flash_attention_lanes(q, k, v, h).astype(jnp.float32)
                * g.astype(jnp.float32)).sum()

    lanes_g = jax.jit(lambda q, k, v: sum(
        sc(t_) for t_ in jax.grad(lanes_loss, argnums=(0, 1, 2))(q, k, v)))
    print(f"lanes fwd+bwd:    {timeit(lanes_g, q, k, v):7.2f} ms", flush=True)

    def xla_attn(q, k, v):
        to_h = lambda a: a.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        o = multi_head_attention(to_h(q), to_h(k), to_h(v), False)
        return o.transpose(0, 2, 1, 3).reshape(b, t, d)

    xla_f = jax.jit(lambda q, k, v: sc(xla_attn(q, k, v)))
    print(f"xla+tr fwd:       {timeit(xla_f, q, k, v):7.2f} ms", flush=True)

    def xla_loss(q, k, v):
        return (xla_attn(q, k, v).astype(jnp.float32)
                * g.astype(jnp.float32)).sum()

    xla_g = jax.jit(lambda q, k, v: sum(
        sc(t_) for t_ in jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)))
    print(f"xla+tr fwd+bwd:   {timeit(xla_g, q, k, v):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
