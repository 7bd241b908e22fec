"""Attention small-kernel granularity sweep at the ViT-S shape.

The small path runs one program per batch item, looping its heads. Since
attention is independent per (b, h) pair, reshaping (B, H) regroups how
many head-tiles each program processes without changing the math:
  h'=1  -> 1536 programs x 1 tile   (max pipelining, max per-step overhead)
  h'=12 -> 128 programs x 12 tiles  (min overhead, long serial chains)
Also times the general blocked kernel (q/k buckets 128) as a grid-shaped
alternative. Identifies whether the T=197 core is overhead- or
serialization-bound.

Usage: python tools/tpu_probe_attn_group.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.kernels import flash_attention as FA

B, H, T, D = 256, 6, 197, 64
DT = jnp.bfloat16


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(ks[0], (B, H, T, D)) * 0.5).astype(DT)
    k = (jax.random.normal(ks[1], (B, H, T, D)) * 0.5).astype(DT)
    v = (jax.random.normal(ks[2], (B, H, T, D)) * 0.5).astype(DT)

    def grouped(hp):
        @jax.jit
        def fb(q, k, v):
            def loss(ops):
                qq, kk, vv = (t.reshape(B * H // hp, hp, T, D) for t in ops)
                o = FA.flash_attention(qq, kk, vv, False, 512, 1024)
                return (o.astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(loss)((q, k, v))
        return fb

    for hp in (1, 2, 3, 6, 12):
        print(f"h'={hp:2d} ({B*H//hp:4d} programs): "
              f"{timeit(grouped(hp), q, k, v):7.2f} ms fwd+bwd", flush=True)

    @jax.jit
    def general(q, k, v):
        def loss(ops):
            o = FA.flash_attention(*ops, False, 128, 128)
            return (o.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((q, k, v))

    print(f"general blocked 128/128: {timeit(general, q, k, v):7.2f} ms fwd+bwd",
          flush=True)


main()
