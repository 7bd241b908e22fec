"""Does Mosaic's int8 dot_general hit the native int8 MXU rate?

The fused int8 kernel (kanvit/kernels/int8_matmul.py) loses to BOTH bf16
and the XLA int8-stat path (benchmarks/int8_kernel_probe.json) even after
hoisting weight quantization to XLA. The epilogue is a few VPU ops, so the
suspect is the dot itself: XLA lowers int8xint8->int32 to the native
double-rate MXU path (394.7 TOPs measured, int8_matmul_probe.json); if
Mosaic lowers `lax.dot_general(int8, int8, preferred=int32)` to something
slower (upcast passes), the in-register-Q/DQ design is dead on arrival
regardless of how much HBM glue it removes.

Times a bare (n, 768) x (768, 3072) matmul, pre-quantized operands, no
quant/dequant anywhere:
  xla-int8     — lax.dot_general int8->int32 under jit,
  pallas-int8  — the same dot inside a pallas_call with the fused kernel's
                 exact grid/blockspec geometry (bn=256, bo=512),
  pallas-bf16  — same geometry, bf16 operands, f32 accum (launch-overhead
                 control: separates grid cost from the int8 rate).

Writes benchmarks/mosaic_int8_rate_probe.json.
Usage: python tools/tpu_probe_mosaic_int8_rate.py
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, F = 768, 3072
BN, BO = 256, 512
K, STEPS, REPS = 4, 10, 3


def _pallas_dot(xq, wtq, out_dtype, acc_dtype):
    n = xq.shape[0]
    y = pl.pallas_call(
        lambda x_ref, w_ref, y_ref: y_ref.__setitem__(
            slice(None),
            lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            ).astype(out_dtype),
        ),
        grid=(n // BN, F // BO),
        in_specs=[
            pl.BlockSpec((BN, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BO), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, BO), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, F), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xq, wtq)
    return y


def _perturb_int8(x, acc):
    # Data-dependent zero (acc stays ~0 at runtime, XLA can't prove it):
    # forces a fresh dot per iteration without changing the int8 values.
    p = jnp.where(acc > 1e30, jnp.int8(1), jnp.int8(0))
    return x + p


def _perturb_bf16(x, acc):
    return x * (jnp.asarray(1, x.dtype) + acc.astype(x.dtype) * 1e-12)


def chain_time(f, x, perturb):
    @jax.jit
    def run(x):
        def body(acc, _):
            for _ in range(K):
                y = f(perturb(x, acc))
                acc = acc + y
            return acc, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=STEPS)
        return c

    float(np.asarray(run(x)))
    float(np.asarray(run(x)))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(x)
        float(np.asarray(out))
        ts.append((time.perf_counter() - t0) / (STEPS * K) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    out = {"D": D, "F": F, "BN": BN, "BO": BO, "rows": {}}
    wq_n = rng.integers(-127, 128, size=(D, F)).astype(np.int8)
    wtq = jnp.asarray(wq_n)
    wbf = jnp.asarray(wq_n.astype(np.float32) / 127.0, jnp.bfloat16)

    for batch in (64, 256):
        n = ((batch * 197 + BN - 1) // BN) * BN  # pad like the kernel does
        xq_n = rng.integers(-127, 128, size=(n, D)).astype(np.int8)
        xq = jnp.asarray(xq_n)
        xbf = jnp.asarray(xq_n.astype(np.float32) / 127.0, jnp.bfloat16)

        modes = {
            "xla-int8": (
                lambda x: jnp.sum(lax.dot_general(
                    x, wtq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)) * 1e-30,
                xq, _perturb_int8,
            ),
            "pallas-int8": (
                lambda x: jnp.sum(_pallas_dot(
                    x, wtq, jnp.int32, jnp.int32
                ).astype(jnp.float32)) * 1e-30,
                xq, _perturb_int8,
            ),
            "pallas-bf16": (
                lambda x: jnp.sum(_pallas_dot(
                    x, wbf, jnp.float32, jnp.float32
                )) * 1e-30,
                xbf, _perturb_bf16,
            ),
        }
        for name, (f, xin, pert) in modes.items():
            ms = chain_time(f, xin, pert)
            tops = 2 * n * D * F / (ms * 1e-3) / 1e12
            out["rows"][f"b{batch}/{name}"] = {
                "ms": round(ms, 4), "tops": round(tops, 1),
            }
            print(f"b{batch:3d} {name:12s} {ms:8.4f} ms  {tops:7.1f} TOPs",
                  flush=True)

    path = os.path.join(REPO, "benchmarks", "mosaic_int8_rate_probe.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
