"""Decompose ViT-S MSA (efficientkan) time on TPU.

Times fwd+bwd of: (a) the full MSA, (b) the shared-basis qkv projection
alone, (c) the attention einsum alone, (d) MSA with the dead per-head
projections structurally removed (tests whether XLA DCE actually prunes
them around the Pallas custom calls).

Usage: python tools/tpu_probe_msa.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.layers.attention import MSA, _shared_basis_qkv
from kanvit.ops.attention import multi_head_attention

B, T, D, H = 256, 197, 384, 6
DH = D // H
DT = jnp.bfloat16


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, T, D)) * 0.5).astype(DT)
    msa = MSA(d=D, n_heads=H, type="efficientkan")
    p = jax.tree.map(
        lambda a: a.astype(DT),
        msa.init(jax.random.PRNGKey(1), x)["params"],
    )

    @jax.jit
    def full(p, x):
        def loss(p):
            return (msa.apply({"params": p}, x).astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)(p)

    print(f"a. full MSA fwd+bwd:            {timeit(full, p, x):7.2f} ms",
          flush=True)

    xh = jnp.moveaxis(x.reshape(B, T, H, DH), 2, 0)

    @jax.jit
    def qkv_only(p, xh):
        def loss(p):
            q, k, v = _shared_basis_qkv(
                "efficientkan", xh, DH,
                p["q_mappings"], p["k_mappings"], p["v_mappings"],
            )
            return (
                (q.astype(jnp.float32) ** 2).mean()
                + (k.astype(jnp.float32) ** 2).mean()
                + (v.astype(jnp.float32) ** 2).mean()
            )
        return jax.value_and_grad(loss)(p)

    print(f"b. shared qkv only fwd+bwd:     {timeit(qkv_only, p, xh):7.2f} ms",
          flush=True)

    q = (jax.random.normal(jax.random.PRNGKey(2), (B, H, T, DH)) * 0.5).astype(DT)

    @jax.jit
    def attn_only(q):
        def loss(q):
            return (multi_head_attention(q, q, q).astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)(q)

    print(f"c. attention einsum fwd+bwd:    {timeit(attn_only, q):7.2f} ms",
          flush=True)

    # d. shared qkv + attention + reshapes == MSA minus the (supposedly
    # DCE'd) per-head projection calls
    @jax.jit
    def no_dead(p, x):
        def loss(p):
            xh = jnp.moveaxis(x.reshape(B, T, H, DH), 2, 0)
            q, k, v = _shared_basis_qkv(
                "efficientkan", xh, DH,
                p["q_mappings"], p["k_mappings"], p["v_mappings"],
            )
            q, k, v = (jnp.moveaxis(a, 0, 1) for a in (q, k, v))
            out = multi_head_attention(q, k, v)
            out = jnp.moveaxis(out, 1, 2).reshape(B, T, D)
            return (out.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)(p)

    print(f"d. MSA w/o dead projections:    {timeit(no_dead, p, x):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
