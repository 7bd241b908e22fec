"""TPU smoke test for the fused-basis kernel tiers + flash bf16 dots.

Runs the ViT-S embedder shape (768 -> 384, the out-blocked tier) and a
head-projection shape (64 -> 192, the plain tier) fwd+bwd under forced
Pallas on the real device, in f32 and bf16, checking values against the
jnp ground truth and printing step times.

Usage: python tools/tpu_smoke_fused.py
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


def check(name, n, nin, out, dt, tol):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = (jax.random.normal(k1, (n, nin)) * 0.5).astype(dt)
    grid = K.make_bspline_grid(nin, 5, 3)
    bw = (jax.random.normal(k2, (out, nin)) * 0.02).astype(dt)
    sw = (jax.random.normal(k3, (out, nin, 8)) * 0.02).astype(dt)
    sc = (jax.random.normal(k4, (out, nin)) * 0.02).astype(dt)

    def loss_pal(x, bw, sw, sc):
        return (FB.bspline_kan(x, grid, bw, sw, sc, 3).astype(jnp.float32) ** 2).mean()

    def loss_ref(x, bw, sw, sc):
        f32 = lambda a: a.astype(jnp.float32)
        return (K.bspline_kan_forward(f32(x), grid, f32(bw), f32(sw), f32(sc), 3) ** 2).mean()

    dispatch.set_impl("pallas")
    vgp = jax.jit(jax.value_and_grad(loss_pal, argnums=(0, 1, 2, 3)))
    lp, gp = vgp(x, bw, sw, sc)
    dispatch.set_impl("auto")
    lr, gr = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3)))(x, bw, sw, sc)
    err = max(
        float(jnp.abs(a.astype(jnp.float32) - b).max()) for a, b in zip(gp, gr)
    )
    lerr = abs(float(lp) - float(lr))
    # time the pallas step
    dispatch.set_impl("pallas")
    for _ in range(3):
        lp, gp = vgp(x, bw, sw, sc)
    float(lp)
    t0 = time.perf_counter()
    for _ in range(10):
        lp, gp = vgp(x, bw, sw, sc)
    float(lp)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    dispatch.set_impl("auto")
    status = "OK" if (lerr < tol and err < tol * 50) else "MISMATCH"
    print(f"{name}: loss_err={lerr:.2e} grad_err={err:.2e} {ms:.2f} ms [{status}]",
          flush=True)
    return status == "OK"


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ok = True
    ok &= check("embedder f32", 50176, 768, 384, jnp.float32, 1e-4)
    ok &= check("embedder bf16 (split bwd)", 50176, 768, 384, jnp.bfloat16, 3e-2)
    ok &= check("head f32 (plain)", 50432, 64, 192, jnp.float32, 1e-4)
    ok &= check("head bf16 (plain, packed)", 50432, 64, 192, jnp.bfloat16, 3e-2)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
