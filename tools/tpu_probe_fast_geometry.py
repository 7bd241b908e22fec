"""Bounded launch-geometry A/B for the fast (RBF+LN) MSA — VERDICT r4 #9.

Round 4 reconciled fast MSA's gap over its ~10.6 ms/block floor: the
in-kernel LN/silu chain plus ~0.9 ms of grid/pipeline overhead
(CLAUDE.md round-4 settled items). This is the one sanctioned attempt at
launch-geometry reduction before declaring that floor final: force larger
row blocks (fewer grid steps) on the slot-grouped RBF+LN qkv kernels under
a raised scoped-VMEM limit, and time the REAL fast MSA fwd+bwd chained.

Method: chain fwd+bwd iterations inside one jit (lax.scan, bf16 carry
perturbation, hard-synced warmup — CLAUDE.md methodology); monkeypatch
``fused_basis._rbf_ln_sg_bn`` (scaled pick) + ``_SG_VMEM_LIMIT``.

Writes benchmarks/fast_geometry_probe.json.
Usage: python tools/tpu_probe_fast_geometry.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.kernels import fused_basis as FB
from kanvit.layers.attention import MSA

B, T, D, H = 256, 197, 384, 6
DT = jnp.bfloat16


def chain_grad(msa, p, x, steps=10, reps=3):
    @jax.jit
    def run(p, x):
        def body(c, _):
            xp = x * (jnp.asarray(1, x.dtype) + c.astype(x.dtype) * 1e-12)

            def loss(p):
                return (msa.apply({"params": p}, xp)
                        .astype(jnp.float32) ** 2).mean()

            v, g = jax.value_and_grad(loss)(p)
            gsum = sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))
            return c + (v + gsum) * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    out = run(p, x)
    out = run(p, x)
    float(np.asarray(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(p, x)
        float(np.asarray(out))
        times.append((time.perf_counter() - t0) / steps * 1000)
    return sorted(times)[len(times) // 2]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    msa = MSA(D, H, type="fast")
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, T, D)) * 0.5).astype(DT)
    p = jax.tree.map(lambda a: a.astype(DT),
                     msa.init(jax.random.PRNGKey(1), x)["params"])

    # The winning geometry (x4, 64M) shipped as the default
    # (_RBF_SG_BN_SCALE / _RBF_SG_VMEM_LIMIT in fused_basis.py); this
    # probe drives those knobs directly, so case scales here are absolute.
    prod_scale, prod_lim = FB._RBF_SG_BN_SCALE, FB._RBF_SG_VMEM_LIMIT
    FB._RBF_SG_BN_SCALE, FB._RBF_SG_VMEM_LIMIT = 1, None
    auto_fwd = FB._rbf_ln_sg_bn(64, 9, 64, x.reshape(-1, D),
                                jnp.zeros((1, 1), DT), 2, False)
    auto_bwd = FB._rbf_ln_sg_bn(64, 9, 64, x.reshape(-1, D),
                                jnp.zeros((1, 1), DT), 2, True)
    print(f"base bn: fwd {auto_fwd} bwd {auto_bwd} "
          f"(shipped scale {prod_scale}, limit {prod_lim})", flush=True)

    results = []

    def case(tag, scale, lim_mb):
        FB._RBF_SG_BN_SCALE = scale
        FB._RBF_SG_VMEM_LIMIT = lim_mb * 1024 * 1024 if lim_mb else None
        try:
            ms = chain_grad(msa, p, x)
            row = {"tag": tag, "bn_scale": scale, "vmem_limit_mb": lim_mb,
                   "msa_fwdbwd_ms": round(ms, 3)}
        except Exception as e:
            row = {"tag": tag, "bn_scale": scale, "vmem_limit_mb": lim_mb,
                   "error": str(e)[:160]}
        finally:
            FB._RBF_SG_BN_SCALE, FB._RBF_SG_VMEM_LIMIT = 1, None
        print(json.dumps(row), flush=True)
        results.append(row)

    case("baseline", 1, None)
    case("bn x2, 32M", 2, 32)
    case("bn x4, 64M", 4, 64)
    case("bn x8, 100M", 8, 100)
    case("baseline again", 1, None)  # drift control
    FB._RBF_SG_BN_SCALE, FB._RBF_SG_VMEM_LIMIT = prod_scale, prod_lim

    path = os.path.join(REPO, "benchmarks", "fast_geometry_probe.json")
    with open(path, "w") as f:
        json.dump({"results": results, "auto_bn": [auto_fwd, auto_bwd],
                   "shape": {"B": B, "T": T, "D": D, "H": H},
                   "device": str(jax.devices()[0])}, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
