"""Roofline decomposition of the T=197 attention core (VERDICT round-3 #5).

The fused Pallas small-path kernel and XLA's fused attention tie at
(B=256, H=6, T=197, d=64) bf16 (tools/tpu_probe_attn_small.py: 4.93 vs
4.73 ms fwd+bwd), and regrouping work per program changes nothing
(tools/tpu_probe_attn_group.py: 4.78-4.94 ms across h' in {1,2,3,6,12}).
This probe tests the remaining hypothesis: the floor is the COMPONENT DOT
SHAPES themselves, not fusion or scheduling. It times each constituent
batched matmul of the attention fwd+bwd standalone (pure XLA, nothing else
in the program), plus the standalone softmax/rescale elementwise chains.
If the sum of the parts ~= the fused whole, no kernel restructuring that
preserves the math can beat it — the only remaining lever would be
changing the shapes (e.g. fewer, wider heads), which is a model change,
not a kernel change.

fwd:  S = q k^T            (BH, T, T)  <- contraction K=64 (half-MXU)
      P = softmax(S)       VPU
      O = P v              (BH, T, d)  <- contraction K=T
bwd:  dV = P^T dO          (BH, T, d)  <- contraction K=T
      dP = dO v^T          (BH, T, T)  <- contraction K=64 (half-MXU)
      dS = P*(dP - rowsum) VPU
      dQ = dS k            (BH, T, d)  <- contraction K=T
      dK = dS^T q          (BH, T, d)  <- contraction K=T

Usage: python tools/tpu_probe_attn_roofline.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

B, H, T, D = 256, 6, 197, 64
BH = B * H
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


def bmm(contract_right, a_shape, b_shape):
    """Batched matmul a @ b (or a @ b^T) as its own jitted program."""
    ka = jax.random.normal(jax.random.PRNGKey(0), a_shape).astype(DT)
    kb = jax.random.normal(jax.random.PRNGKey(1), b_shape).astype(DT)
    if contract_right:  # (BH,M,K) @ (BH,N,K)^T
        dn = (((2,), (2,)), ((0,), (0,)))
    else:               # (BH,M,K) @ (BH,K,N)
        dn = (((2,), (1,)), ((0,), (0,)))
    f = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32).astype(DT))
    return timeit(f, ka, kb)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    flops = {}
    ms = {}

    # --- the five dots, exact attention shapes ---
    ms["S=qk^T (K=64)"] = bmm(True, (BH, T, D), (BH, T, D))
    ms["O=Pv   (K=T) "] = bmm(False, (BH, T, T), (BH, T, D))
    ms["dV=P^T dO (K=T)"] = bmm(False, (BH, T, T), (BH, T, D))  # same shape class
    ms["dP=dO v^T (K=64)"] = bmm(True, (BH, T, D), (BH, T, D))
    ms["dQ=dS k (K=T)"] = bmm(False, (BH, T, T), (BH, T, D))
    ms["dK=dS^T q (K=T)"] = bmm(False, (BH, T, T), (BH, T, D))
    flops["K=64 dots"] = 2 * 2.0 * BH * T * T * D
    flops["K=T dots"] = 4 * 2.0 * BH * T * T * D

    # --- the elementwise chains ---
    s = jax.random.normal(jax.random.PRNGKey(2), (BH, T, T)).astype(DT)
    fsm = jax.jit(lambda s: jax.nn.softmax(
        s.astype(jnp.float32), axis=-1).astype(DT))
    ms["softmax fwd"] = timeit(fsm, s)
    p = fsm(s)
    do = jax.random.normal(jax.random.PRNGKey(3), (BH, T, T)).astype(DT)
    fds = jax.jit(lambda p, dp: (
        p.astype(jnp.float32)
        * (dp.astype(jnp.float32)
           - jnp.sum(p.astype(jnp.float32) * dp.astype(jnp.float32),
                     axis=-1, keepdims=True))).astype(DT))
    ms["dS chain"] = timeit(fds, p, do)

    total = 0.0
    for k, v in ms.items():
        print(f"  {k:22s}: {v:7.3f} ms", flush=True)
        total += v
    print(f"  {'SUM OF PARTS':22s}: {total:7.3f} ms", flush=True)

    # --- the fused whole, both paths ---
    from kanvit.kernels import flash_attention as FA

    q = jax.random.normal(jax.random.PRNGKey(4), (B, H, T, D)).astype(DT)
    k = jax.random.normal(jax.random.PRNGKey(5), (B, H, T, D)).astype(DT)
    v = jax.random.normal(jax.random.PRNGKey(6), (B, H, T, D)).astype(DT)

    def loss_pallas(args):
        q, k, v = args
        return (FA.flash_attention(q, k, v).astype(jnp.float32) ** 2).mean()

    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def loss_xla(args):
        q, k, v = args
        return (xla_attn(q, k, v).astype(jnp.float32) ** 2).mean()

    gp = jax.jit(jax.value_and_grad(loss_pallas))
    gx = jax.jit(jax.value_and_grad(loss_xla))
    print(f"  {'pallas fused fwd+bwd':22s}: {timeit(gp, (q, k, v)):7.3f} ms",
          flush=True)
    print(f"  {'xla fused fwd+bwd':22s}: {timeit(gx, (q, k, v)):7.3f} ms",
          flush=True)

    mxu = sum(flops.values()) / 197e12 * 1e3
    print(f"\n  ideal MXU time (197 TFLOP/s bf16): {mxu:.3f} ms", flush=True)
    print("  -> if SUM OF PARTS ~= fused paths, the tie is a shape floor:",
          flush=True)
    print("     the K=64 dots half-fill the MXU and T=197 pads to the tile;",
          flush=True)
    print("     no fusion recovers that without changing head geometry.",
          flush=True)


main()
