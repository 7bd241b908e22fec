"""Roofline decomposition of the T=197 attention core (VERDICT round-3 #5).

The fused Pallas small-path kernel and XLA's fused attention tie at
(B=256, H=6, T=197, d=64) bf16 (tools/tpu_probe_attn_small.py: 4.93 vs
4.73 ms fwd+bwd), and regrouping work per program changes nothing
(tools/tpu_probe_attn_group.py: 4.78-4.94 ms across h' in {1,2,3,6,12}).
This probe tests the remaining hypothesis: the floor is the COMPONENT
SHAPES themselves, not fusion or scheduling. It times each constituent
batched matmul of the attention fwd+bwd standalone (pure XLA, nothing else
in the program), plus the softmax/rescale elementwise chains. If the sum
of the parts ~= the fused whole, no kernel restructuring that preserves
the math can beat it — the only remaining lever would be changing the
shapes (e.g. fewer, wider heads), which is a model change, not a kernel
change.

All timings ride a single lax.scan device program per component (N
sequential applications chained through a per-step additive zero from the
scan xs so XLA cannot hoist the op out of the loop) — per-dispatch timing
of sub-ms programs on this tunneled transport measures only transport
latency (CLAUDE.md measurement notes; first version of this probe showed
113 ms for a 0.1 ms matmul that way).

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
STEPS = 30


def timeit_scanned(op, *args, steps=STEPS):
    """Median-of-3 windows; each window is ONE device program scanning the
    op ``steps`` times, chained via a scan-carried zero perturbation."""

    @jax.jit
    def window(args, zs):
        def body(c, z):
            out = op(*((a + z.astype(a.dtype)) for a in args[:1]), *args[1:])
            first = jax.tree.leaves(out)[0]
            return c + first.ravel()[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), zs)
        return c

    zs = jnp.zeros((steps,), jnp.float32)
    c = window(args, zs)
    float(np.asarray(c))  # warmup + hard sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = window(args, zs)
        float(np.asarray(c))
        ts.append((time.perf_counter() - t0) / steps * 1e3)
    return sorted(ts)[1]


def rnd(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape).astype(DT)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ms = {}

    dn_t = (((2,), (2,)), ((0,), (0,)))  # a @ b^T over last dims
    dn_n = (((2,), (1,)), ((0,), (0,)))  # a @ b

    def dot_t(a, b):
        return jax.lax.dot_general(
            a, b, dn_t, preferred_element_type=jnp.float32).astype(DT)

    def dot_n(a, b):
        return jax.lax.dot_general(
            a, b, dn_n, preferred_element_type=jnp.float32).astype(DT)

    qk = rnd(0, (BH, T, D))
    kk = rnd(1, (BH, T, D))
    pp = rnd(2, (BH, T, T))
    vv = rnd(3, (BH, T, D))

    # --- the five dots, exact attention shapes ---
    ms["S=qk^T   (K=64)"] = timeit_scanned(dot_t, qk, kk)
    ms["O=Pv     (K=T)"] = timeit_scanned(dot_n, pp, vv)
    ms["dV=P^T dO (K=T)"] = ms["O=Pv     (K=T)"]  # same shape class
    ms["dP=dO v^T (K=64)"] = ms["S=qk^T   (K=64)"]  # same shape class
    ms["dQ=dS k  (K=T)"] = ms["O=Pv     (K=T)"]
    ms["dK=dS^T q (K=T)"] = ms["O=Pv     (K=T)"]

    # --- the elementwise chains ---
    def sm(s):
        return jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(DT)

    ms["softmax fwd"] = timeit_scanned(sm, pp)

    dof = rnd(4, (BH, T, T))

    def ds_chain(p, dp):
        pf = p.astype(jnp.float32)
        dpf = dp.astype(jnp.float32)
        return (pf * (dpf - jnp.sum(pf * dpf, axis=-1, keepdims=True))
                ).astype(DT)

    ms["dS chain"] = timeit_scanned(ds_chain, pp, dof)

    total = 0.0
    for k, v in ms.items():
        print(f"  {k:22s}: {v:7.3f} ms", flush=True)
        total += v
    print(f"  {'SUM OF PARTS':22s}: {total:7.3f} ms", flush=True)

    # --- the fused whole, both paths, same scanned measurement ---
    from kanvit.kernels import flash_attention as FA

    q4 = rnd(5, (B, H, T, D))
    k4 = rnd(6, (B, H, T, D))
    v4 = rnd(7, (B, H, T, D))

    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def grad_of(attn):
        def f(q, k, v):
            def loss(args):
                return (attn(*args).astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(loss)((q, k, v))
        return f

    ms_p = timeit_scanned(grad_of(FA.flash_attention), q4, k4, v4, steps=10)
    ms_x = timeit_scanned(grad_of(xla_attn), q4, k4, v4, steps=10)
    print(f"  {'pallas fused fwd+bwd':22s}: {ms_p:7.3f} ms", flush=True)
    print(f"  {'xla fused fwd+bwd':22s}: {ms_x:7.3f} ms", flush=True)

    flops = 6 * 2.0 * BH * T * T * D
    print(f"\n  ideal MXU time for the 6 dots (197 TFLOP/s bf16): "
          f"{flops / 197e12 * 1e3:.3f} ms", flush=True)


main()
