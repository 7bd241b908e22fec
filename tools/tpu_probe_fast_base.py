"""How much do FastKAN's XLA-side base branches cost at ViT-S MSA scale?

Times fwd+bwd of 18 vmapped FastKAN projections (6 heads x q/k/v, the fast
variant's per-block load) with and without the silu base branch, plus the
LN-in-XLA share. Decides whether a dedicated dual-input rbf+base kernel is
worth building.

Usage: python tools/tpu_probe_fast_base.py
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
from kanvit.ops import kan_bases as K

B, T, DH, NPROJ = 256, 197, 64, 18
N = B * T
NG = 8
DT = jnp.bfloat16


def timeit(fn, *fargs, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*fargs)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*fargs) for _ in range(steps)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = (jax.random.normal(ks[0], (NPROJ, N, DH)) * 0.5).astype(DT)
    grid = jnp.linspace(-2.0, 2.0, NG)
    denom = 4.0 / (NG - 1)
    lng = (jnp.ones((NPROJ, DH))).astype(DT)
    lnb = (jnp.zeros((NPROJ, DH))).astype(DT)
    sw = (jax.random.normal(ks[1], (NPROJ, DH, DH * NG)) * 0.05).astype(DT)
    bw = (jax.random.normal(ks[2], (NPROJ, DH, DH)) * 0.05).astype(DT)
    bb = jnp.zeros((NPROJ, DH), DT)

    def run(with_base, with_ln):
        @jax.jit
        def f(x, sw, bw):
            def loss(ops):
                sw, bw = ops
                def one(x_h, lng_h, lnb_h, sw_h, bw_h, bb_h):
                    return FB.fastkan(
                        x_h,
                        lng_h if with_ln else None,
                        lnb_h if with_ln else None,
                        grid, denom, sw_h,
                        bw_h if with_base else None,
                        bb_h if with_base else None,
                    )
                y = jax.vmap(one)(x, lng, lnb, sw, bw, bb)
                return (y.astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(loss)((sw, bw))
        return timeit(f, x, sw, bw)

    print(f"18-proj fastkan full (ln+base):   {run(True, True):7.2f} ms", flush=True)
    print(f"18-proj fastkan no base:          {run(False, True):7.2f} ms", flush=True)
    print(f"18-proj fastkan no ln:            {run(True, False):7.2f} ms", flush=True)
    print(f"18-proj fastkan bare (rbf only):  {run(False, False):7.2f} ms", flush=True)


main()
