"""Ablate the shared-basis qkv projection cost on TPU, piece by piece.

Times fwd+bwd (unchained dispatch, one block at the end) of:
  a. 6-head vmap of the packed _bspline_op alone (pre-packed weights)
  b. a + the silu base branch
  c. b + the q/k/v weight concat + scaler mul + packing transforms
     (= bspline_kan called under vmap, i.e. the real path)
  d. fwd-only of a (to split fwd vs bwd)

Usage: python tools/tpu_probe_qkv_parts.py
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

B, T, D, H = 256, 197, 384, 6
DH = D // H
OUT = 3 * DH
NG = 8
DT = jnp.bfloat16
N = B * T


def timeit(fn, *fargs, steps=30, warmup=3):
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
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    xh = (jax.random.normal(ks[0], (H, N, DH)) * 0.5).astype(DT)
    grid = K.make_bspline_grid(DH, 5, 3)
    # Pre-packed operands for arm (a): (H, N/2, 128) x and (H, NG, 128, 2*OUT) w
    p = 2
    xp = xh.reshape(H, N // p, p * DH)
    w3d = (jax.random.normal(ks[1], (H, NG, DH, OUT)) * 0.02).astype(DT)
    wp = jax.vmap(lambda w: FB._pack_w3d(w, p))(w3d)
    gridt_p = jnp.tile(grid.T, (1, p))

    # Unpacked full-layer params for arms (b, c)
    bw = (jax.random.normal(ks[2], (H, OUT, DH)) * 0.02).astype(DT)
    sw = (jax.random.normal(ks[3], (H, OUT, DH, NG)) * 0.02).astype(DT)
    sc = (jax.random.normal(ks[4], (H, OUT, DH)) * 0.02).astype(DT)

    @jax.jit
    def arm_a(xp, wp):
        def loss(wp):
            y = jax.vmap(
                lambda x_h, w_h: FB._bspline_op(x_h, w_h, gridt_p, 5, 3)
            )(xp, wp)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)(wp)

    print(f"a. op-only packed 6-head fwd+bwd:  {timeit(arm_a, xp, wp):7.2f} ms",
          flush=True)

    @jax.jit
    def arm_a_fwd(xp, wp):
        y = jax.vmap(
            lambda x_h, w_h: FB._bspline_op(x_h, w_h, gridt_p, 5, 3)
        )(xp, wp)
        return (y.astype(jnp.float32) ** 2).mean()

    print(f"d. op-only packed 6-head fwd only: {timeit(arm_a_fwd, xp, wp):7.2f} ms",
          flush=True)

    @jax.jit
    def arm_b(xh, wp, bw):
        def loss(ops):
            wp, bw = ops
            def one(x_h, w_h, bw_h):
                xp_h = x_h.reshape(N // p, p * DH)
                sp = FB._bspline_op(xp_h, w_h, gridt_p, 5, 3)
                return sp.reshape(N, OUT) + jax.nn.silu(x_h) @ bw_h.T
            y = jax.vmap(one)(xh, wp, bw)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((wp, bw))

    print(f"b. + silu base branch fwd+bwd:     {timeit(arm_b, xh, wp, bw):7.2f} ms",
          flush=True)

    @jax.jit
    def arm_c(xh, bw, sw, sc):
        def loss(ops):
            bw, sw, sc = ops
            y = jax.vmap(
                lambda x_h, bw_h, sw_h, sc_h: FB.bspline_kan(
                    x_h, grid, bw_h, sw_h, sc_h, 3
                )
            )(xh, bw, sw, sc)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((bw, sw, sc))

    print(f"c. full bspline_kan path fwd+bwd:  {timeit(arm_c, xh, bw, sw, sc):7.2f} ms",
          flush=True)


main()
