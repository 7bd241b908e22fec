"""int8 serving quantization for the Linear compute path.

v5e's MXU runs int8xint8->int32 at 394.7 TOPs vs 197.4 bf16 TFLOPs, and the
measured gap at ViT-B serving shapes is 1.26-1.88x
(``benchmarks/int8_matmul_probe.json``, ``tools/tpu_probe_int8_matmul.py``)
— so forward-only serving can run the reference's ``nn.Linear`` matmuls
(kanvit ``TorchLinear``: FF pairs everywhere, vanilla/flash-attn q/k/v and
output projections, the classifier head) on the int8 path:

- weights: symmetric per-OUTPUT-CHANNEL int8 (scale = max|w_row| / 127),
- activations: symmetric per-TENSOR dynamic int8 (scale computed per call),
- accumulation in int32 on the MXU, dequantized by one fused f32 multiply.

This is a SERVING mode: enabled by wrapping the jitted forward's trace in
:func:`int8_serving` (``Predictor(quant="int8")``); training and parity
paths never see it. KAN basis expansions, LayerNorms and attention cores
stay in the float path — int8 applies exactly where the reference's
``nn.Linear`` would run (the dominant FLOPs at ViT-B/L for the
vanilla/flash variants).

The flag is read at TRACE time (a contextvar), so a program jitted inside
the context stays quantized for its lifetime and programs traced outside
are untouched.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp
from jax import lax

_INT8_SERVING = contextvars.ContextVar("kanvit_int8_serving", default=False)
# Per-layer STATIC activation scales {scope-path: float} captured by
# calibration. A layer found here skips the per-call max-reduce — measured
# the difference between losing and winning: the ViT-B FF pair runs 1.90 ms
# bf16 / 1.95 dynamic / 1.29 STATIC (benchmarks/int8_static_probe.json);
# the dynamic max pass is a serialization barrier + an extra HBM read.
_STATIC_SCALES = contextvars.ContextVar("kanvit_int8_scales", default=None)
# Calibration mode: while tracing under calibrating(), TorchLinear sows
# its input |max| into the "quant_amax" mutable collection — jit-compatible
# (an eager capture was measured impractically slow on the tunneled TPU
# transport: every concrete read round-trips the tunnel).
_CALIB_MODE = contextvars.ContextVar("kanvit_int8_calibrate", default=False)


def int8_enabled() -> bool:
    """True while tracing under :func:`int8_serving`."""
    return _INT8_SERVING.get()


def static_scale_for(path: str):
    """The calibrated activation scale for a layer (None = dynamic)."""
    scales = _STATIC_SCALES.get()
    return None if scales is None else scales.get(path)


@contextlib.contextmanager
def int8_serving(scales: dict | None = None):
    """Trace-time switch: TorchLinear dots traced inside this context run
    as int8 MXU dots (W8A8). ``scales`` (from :func:`calibrating`) pins
    per-layer STATIC activation scales; layers not present fall back to
    dynamic per-call scales."""
    tok = _INT8_SERVING.set(True)
    tok2 = _STATIC_SCALES.set(scales)
    try:
        yield
    finally:
        _INT8_SERVING.reset(tok)
        _STATIC_SCALES.reset(tok2)


@contextlib.contextmanager
def calibrating():
    """Trace-time switch: float forward passes traced inside this context
    sow every TorchLinear input's |max| into the ``quant_amax`` mutable
    collection. Run with ``model.apply(..., mutable=["quant_amax"])``
    (jittable), then reduce with :func:`amax_from_mutable` and convert via
    :func:`scales_from_amax`."""
    tok = _CALIB_MODE.set(True)
    try:
        yield
    finally:
        _CALIB_MODE.reset(tok)


def calibrate_enabled() -> bool:
    """True while tracing under :func:`calibrating`."""
    return _CALIB_MODE.get()


def amax_from_mutable(mut: dict) -> dict:
    """Flatten a ``{"quant_amax": tree}`` mutable-collection result into
    ``{scope-path: float amax}`` — the keys match ``TorchLinear``'s
    serving-time scope-path lookups (sow appends an ``amax`` leaf and a
    tuple index; per-head vmapped layers sow an ``(n_heads,)`` vector,
    reduced here to one shared scale)."""
    import jax

    out: dict = {}
    for path, v in jax.tree_util.tree_leaves_with_path(mut["quant_amax"]):
        parts = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        key = "/".join(p for p in parts if p != "amax" and not p.isdigit())
        val = float(jnp.max(jnp.asarray(v)))
        out[key] = max(out.get(key, 0.0), val)
    return out


def scales_from_amax(amax: dict) -> dict:
    """Per-layer symmetric int8 activation scales from calibration maxima."""
    return {k: max(v, 1e-12) / 127.0 for k, v in amax.items()}


def _quantize(a, axis, eps=1e-12):
    """Symmetric int8 quantization along ``axis`` (None = per tensor).
    Returns ``(q int8, scale f32)`` with ``a ~= q * scale``."""
    a32 = a.astype(jnp.float32)
    amax = jnp.max(jnp.abs(a32), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(a32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def qdot_rowwise(x, w, bias=None):
    """``x @ w.T (+ bias)`` with PER-ROW (token) dynamic activation scales
    and per-output-channel weight scales — the jnp ground truth for the
    fused Pallas kernel (``kanvit.kernels.int8_matmul``).

    Per-row scales need only a row-local max (no cross-batch reduction),
    so a kernel with the contraction dim resident computes them in-register
    — no calibration pass, no serialization barrier, and strictly finer
    quantization granularity than the per-tensor scale :func:`qdot` uses.
    Result: ``(xq @ wq.T) * sx[:, None] * sw[None, :] + bias`` in f32.
    """
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    xq, sx = _quantize(x2, axis=-1)  # (n, k) int8, (n, 1) f32
    wq, sw = _quantize(w, axis=-1)   # (out, k) int8, (out, 1) f32
    y = lax.dot_general(
        xq, wq,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * sw.reshape(1, -1)
    if bias is not None:
        y = y + bias.reshape(1, -1).astype(jnp.float32)
    return y.reshape(*x.shape[:-1], w.shape[0])


def qdot(x, w, static_scale: float | None = None):
    """``x @ w.T`` with both operands quantized to int8 and the contraction
    done as an int8xint8->int32 MXU dot.

    ``x``: ``(..., in)`` activations — quantized per tensor with a dynamic
    in-program scale, or with ``static_scale`` (a trace-time constant from
    calibration: no max pass, no serialization barrier — the measured
    difference between losing to bf16 and beating it by 1.47x,
    ``benchmarks/int8_static_probe.json``). ``w``: ``(out, in)``
    torch-convention weights (quantized per output channel). Result is
    f32: ``(xq @ wq.T) * sx * sw``."""
    if static_scale is not None:
        sx = jnp.float32(static_scale)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sx), -127, 127
        ).astype(jnp.int8)
    else:
        xq, sx = _quantize(x, axis=None)
    wq, sw = _quantize(w, axis=-1)  # (out, 1) per-channel
    nb = xq.ndim
    y = lax.dot_general(
        xq, wq,
        (((nb - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw.reshape(-1))
