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


def int8_enabled() -> bool:
    """True while tracing under :func:`int8_serving`."""
    return _INT8_SERVING.get()


@contextlib.contextmanager
def int8_serving():
    """Trace-time switch: TorchLinear dots traced inside this context run
    as int8 MXU dots (W8A8, dynamic activation scales)."""
    tok = _INT8_SERVING.set(True)
    try:
        yield
    finally:
        _INT8_SERVING.reset(tok)


def _quantize(a, axis, eps=1e-12):
    """Symmetric int8 quantization along ``axis`` (None = per tensor).
    Returns ``(q int8, scale f32)`` with ``a ~= q * scale``."""
    a32 = a.astype(jnp.float32)
    amax = jnp.max(jnp.abs(a32), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(a32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def qdot(x, w):
    """``x @ w.T`` with both operands dynamically quantized to int8 and the
    contraction done as an int8xint8->int32 MXU dot.

    ``x``: ``(..., in)`` activations (quantized per tensor, scale computed
    in-program each call). ``w``: ``(out, in)`` torch-convention weights
    (quantized per output channel). Result is f32: ``(xq @ wq.T) * sx * sw``.
    """
    xq, sx = _quantize(x, axis=None)
    wq, sw = _quantize(w, axis=-1)  # (out, 1) per-channel
    nb = xq.ndim
    y = lax.dot_general(
        xq, wq,
        (((nb - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw.reshape(-1))
