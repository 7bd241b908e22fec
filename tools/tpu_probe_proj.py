"""Probe the per-head projection kernel's cost structure on TPU.

Times, at the ViT-S head shape (N=50432, nin=64, F=512, out=192, bf16):
  1. plain XLA matmul of a precomputed (N, F) basis against (F, out)
  2. fused Pallas forward only
  3. fused Pallas fwd+bwd (value_and_grad)
  4. XLA jnp fwd (basis materialized in HBM) for reference
  5. the same via 6-head vmap (the MSA configuration)

Usage: python tools/tpu_probe_proj.py
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
from kanvit.ops import dispatch
from kanvit.ops import kan_bases as K

N, NIN, OUT = 50432, 64, 192
NG = 8
H = 6
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
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = (jax.random.normal(k1, (N, NIN)) * 0.5).astype(DT)
    grid = K.make_bspline_grid(NIN, 5, 3)
    w3d = (jax.random.normal(k2, (NG, NIN, OUT)) * 0.02).astype(DT)
    basis = (jax.random.normal(k3, (N, NG * NIN)) * 0.1).astype(DT)
    w2d = w3d.reshape(NG * NIN, OUT)

    dispatch.set_impl("pallas")

    # 1. plain XLA matmul at the same shape
    mm = jax.jit(lambda b, w: jnp.sum(
        jax.lax.dot_general(b, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)))
    print(f"1. XLA (N,F)@(F,out) matmul:      {timeit(mm, basis, w2d):7.2f} ms",
          flush=True)

    # 2. fused Pallas forward only
    gt = grid.T
    fwd = jax.jit(lambda x, w: jnp.sum(
        FB._bspline_op(x, w, gt, 5, 3).astype(jnp.float32)))
    print(f"2. pallas fwd only:               {timeit(fwd, x, w3d):7.2f} ms",
          flush=True)

    # 3. fused Pallas fwd+bwd
    fb = jax.jit(jax.value_and_grad(
        lambda x, w: jnp.sum(FB._bspline_op(x, w, gt, 5, 3).astype(jnp.float32)),
        argnums=(0, 1)))
    print(f"3. pallas fwd+bwd:                {timeit(fb, x, w3d):7.2f} ms",
          flush=True)

    # 4. XLA jnp path fwd+bwd (basis through HBM)
    def jnp_fwd(x, w):
        b = K.bspline_bases(x.astype(jnp.float32), grid, 3)  # (N, nin, ng)
        b = b.transpose(0, 2, 1).reshape(N, NG * NIN)
        return jnp.sum(jax.lax.dot_general(
            b.astype(DT), w.reshape(NG * NIN, OUT),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))

    jb = jax.jit(jax.value_and_grad(jnp_fwd, argnums=(0, 1)))
    print(f"4. XLA jnp fwd+bwd:               {timeit(jb, x, w3d):7.2f} ms",
          flush=True)

    # 5. six-head vmapped fused fwd+bwd (the MSA shape)
    xh = (jax.random.normal(k1, (H, N, NIN)) * 0.5).astype(DT)
    wh = (jax.random.normal(k2, (H, NG, NIN, OUT)) * 0.02).astype(DT)
    vb = jax.jit(jax.value_and_grad(
        lambda xh, wh: jnp.sum(jax.vmap(
            lambda xx, ww: FB._bspline_op(xx, ww, gt, 5, 3)
        )(xh, wh).astype(jnp.float32)),
        argnums=(0, 1)))
    print(f"5. 6-head vmap pallas fwd+bwd:    {timeit(vb, xh, wh):7.2f} ms",
          flush=True)

    dispatch.set_impl("auto")


if __name__ == "__main__":
    main()
