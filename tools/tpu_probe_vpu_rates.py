"""Elementwise-op rate probe: what does a transcendental actually cost?

Times one elementwise op over a ViT-S basis-sized f32 tile, chained through
a lax.scan carry inside ONE jit (the per-dispatch floor on this tunneled
transport is ~2.9 ms — see CLAUDE.md). Measured on the v5e (2026-08-18,
50432 x 3456 f32, 20 chained iterations):

    mul     16.6 ms/iter      exp      6.0 ms/iter
    sin     12.1 ms/iter      sin+cos 12.6 ms/iter
    tanh     6.3 ms/iter

Every op lands within ~2-3x of the same HBM-bound band, and exp comes out
CHEAPER than the carry-chain mul — i.e. at these shapes XLA's fused
transcendentals are bandwidth-dominated, not ALU-dominated. This is the
calibration behind two round-3 verdicts: the RBF uniform-grid recurrence
(8 exps -> 2, KANVIT_RBF_RECUR) measured negative, and "transcendental
floor" explanations for the sine/fast variants were retired in favor of
structural ones (docs/PERFORMANCE.md "Per-component breakdown").
"""

import time

import jax
import jax.numpy as jnp


def chain(fn, x, steps=20):
    @jax.jit
    def run(x):
        def body(c, _):
            return c * 0.999 + fn(c) * 1e-6, ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c.sum()

    run(x)  # compile + warmup
    t0 = time.perf_counter()
    float(run(x))  # hard scalar D2H sync
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (50432, 3456), jnp.float32)
    for name, fn in [
        ("mul", lambda v: v * 1.0001),
        ("exp", lambda v: jnp.exp(-v * v)),
        ("sin", jnp.sin),
        ("sincos", lambda v: jnp.sin(v) + jnp.cos(v)),
        ("tanh", jnp.tanh),
    ]:
        print(f"{name:7s} {chain(fn, x):7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
