"""(gb, bn) sweep for the fourier kb embedder kernels at the ViT-S mapper
shape (768 -> 384, ng=56, N=50176, bf16): the auto strategy picks
(gb=2, bn_fwd=416, bn_dw=184) — this measures whether bigger slabs / row
blocks beat it (weight re-streams once per row block in fwd; x/g re-stream
once per k block in dw, so both scale with the block counts).

Usage: python tools/tpu_probe_fourier_embed.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.kernels import fused_basis as FB

DT = jnp.bfloat16
N, NIN, OUT, G = 50176, 768, 384, 28
NG = 2 * G


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    float(np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print(f"auto strategy: {FB._kb_strategy(jnp.zeros((N, NIN), DT), jnp.zeros((NG, NIN, OUT), DT), pair=True, recur=True)}",
          flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = (jax.random.normal(k1, (N, NIN)) * 0.5).astype(DT)
    w3d = (jax.random.normal(k2, (NG, NIN, OUT)) * 0.02).astype(DT)
    g = jnp.ones((N, OUT), DT)
    fam = FB.fourier_family_kb(G)
    perm = FB._fourier_interleave(G)
    w3i = w3d[perm]
    hk = FB._fourier_hk(G)

    def sc(t):
        return jnp.sum(t.astype(jnp.float32))

    for gb in (2, 4, 8):
        for bn in (256, 512, 1024):
            try:
                f = jax.jit(lambda x, w: sc(FB._fused_fwd_kb(
                    x, w, (hk,), (FB._smem_spec(hk),), (1,), fam, gb, bn,
                    recur=True)))
                t = timeit(f, x, w3i)
                print(f"fwd gb={gb} bn={bn}: {t:7.2f} ms", flush=True)
            except Exception as e:
                print(f"fwd gb={gb} bn={bn}: FAIL {str(e)[:80]}", flush=True)
    for gb in (2, 4, 8):
        for bn in (128, 256, 512):
            try:
                f = jax.jit(lambda x, w, g: sc(FB._fused_bwd_kb(
                    x, w, g, (hk,), (FB._smem_spec(hk),), (1,), fam, gb,
                    bn, bn, recur=True)[1]))
                t = timeit(f, x, w3i, g)
                print(f"dw-only gb={gb} bn={bn}: {t:7.2f} ms", flush=True)
            except Exception as e:
                print(f"dw gb={gb} bn={bn}: FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
