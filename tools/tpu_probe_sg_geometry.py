"""Geometry sweep for the slot-grouped qkv kernels at the ViT-S MSA shape.

The KAN-projection MSAs cost 2-4x vanilla's (breakdowns: efficientkan
11.31 ms/block, fast 14.33, sine 19.92 vs vanilla ~5.9) and the sg qkv
kernels sit well above their compute/HBM floors (efficientkan qkv floor
~1.5 ms vs ~4.6 measured). This sweeps the row block (bn) and the scoped
VMEM limit on the real grouped launch to see whether the 12M-budget
``_pick_row_block`` choice is the binding constraint.

Shapes: N = 256*197 = 50432 rows, H=6, dh=64, out=3*dh=192 (joint qkv),
efficientkan grid 5 / order 3 (reference model.py ctor), bf16.

Usage: python tools/tpu_probe_sg_geometry.py
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
N, H, DH = 50432, 6, 64
OUT = 3 * DH
GRID, ORDER = 5, 3


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
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = (jax.random.normal(ks[0], (N, H * DH)) * 0.5).astype(DT)
    ng = GRID + ORDER
    grid = jnp.asarray(
        np.linspace(-1 - 3 / GRID, 1 + 3 / GRID, GRID + 2 * ORDER + 1)
    ).reshape(1, -1).repeat(DH, 0)
    bw = (jax.random.normal(ks[1], (H, OUT, DH)) * 0.1).astype(DT)
    sw = (jax.random.normal(ks[2], (H, OUT, DH, ng)) * 0.1).astype(DT)
    sc = jnp.ones((H, OUT, DH), DT)
    g = (jax.random.normal(ks[3], (N, H * OUT)) * 0.5).astype(DT)

    def fwd(x, bw, sw, sc):
        y = FB.bspline_qkv_grouped(x, grid, bw, sw, sc, ORDER)
        return jnp.sum(y.astype(jnp.float32))

    def fwdbwd(x, bw, sw, sc):
        def loss(ops):
            y = FB.bspline_qkv_grouped(ops[0], grid, ops[1], ops[2], ops[3],
                                       ORDER)
            return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))
        return jax.value_and_grad(loss)((x, bw, sw, sc))

    orig_bn = FB._sg_bn
    base_fwd_bn = orig_bn(DH, OUT, FB.bspline_family(GRID, ORDER, True),
                          x, jnp.zeros((1, 1), DT), 2, False)
    base_bwd_bn = orig_bn(DH, OUT, FB.bspline_family(GRID, ORDER, True),
                          x, jnp.zeros((1, 1), DT), 2, True)
    print(f"auto bn: fwd {base_fwd_bn} bwd {base_bwd_bn}", flush=True)
    print(f"baseline fwd:     {timeit(jax.jit(fwd), x, bw, sw, sc):7.2f} ms",
          flush=True)
    print(f"baseline fwd+bwd: {timeit(jax.jit(fwdbwd), x, bw, sw, sc):7.2f} ms",
          flush=True)

    for bn, lim in ((1024, 64), (2048, 64), (4096, 100), (8192, 100)):
        FB._sg_bn = lambda *a, **k: bn
        FB._SG_VMEM_LIMIT = lim * 1024 * 1024
        try:
            tf = timeit(jax.jit(fwd), x, bw, sw, sc)
            tb = timeit(jax.jit(fwdbwd), x, bw, sw, sc)
            print(f"bn={bn:5d} lim={lim:3d}M: fwd {tf:7.2f} ms   "
                  f"fwd+bwd {tb:7.2f} ms", flush=True)
        except Exception as e:
            print(f"bn={bn:5d} lim={lim:3d}M: FAIL {str(e)[:110]}",
                  flush=True)
        finally:
            FB._sg_bn = orig_bn
            FB._SG_VMEM_LIMIT = None

    # floors for reference
    wlin = (jax.random.normal(ks[4], (H * DH, H * OUT)) * 0.1).astype(DT)

    def lin(x, w):
        return jnp.sum((x @ w).astype(jnp.float32))

    print(f"dense (384x1152) linear fwd floor: "
          f"{timeit(jax.jit(lin), x, wlin):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
