"""Inference: a jit-compiled batched Predictor + a small prediction CLI.

The reference has no inference path at all (training script only); kanvit
adds one as part of being a complete framework: load a checkpoint, classify
in fixed-size jitted batches (ragged tails padded, never recompiled), return
logits / probabilities / labels.

Serving deployment: :meth:`Predictor.export` serializes the compiled
forward — weights baked in as constants — to a portable ``jax.export``
StableHLO artifact; :func:`load_exported` serves from that single file with
no model code, checkpoint, or kanvit config needed (and no Python re-trace:
the artifact IS the program). Pallas kernels ride along as
``tpu_custom_call``, which is on jax.export's guaranteed-stable custom-call
list.

CLI: ``python -m kanvit.infer --model-type X --ckpt-dir ckpts --dataset mnist``
     ``python -m kanvit.infer --exported model.kanvit --dataset mnist``
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Predictor:
    """Batched, fixed-shape, jit-compiled classifier.

    ``microbatch``: optionally run each jitted batch as a ``lax.map`` over
    fixed-size chunks (one dispatch, chunks serialized on-device). Forward-
    only per-image cost RISES with batch on v5e for the large presets
    (measured: ViT-S efficientkan bf16 per-block fwd 12.7 -> 18.9 us/img
    from batch 64 -> 256, every component — qkv kernel, lanes attention,
    FF matmuls — degrading together; ``benchmarks/infer_msa_probe.json``),
    so serving large batches at the fwd-optimal chunk size (64 at ViT-S)
    beats the flat batch. Opt-in: the small reference config scales
    cleanly flat (160k img/s at 256) and would only lose.
    """

    model: object
    params: dict
    batch_size: int = 256
    microbatch: int | None = None
    # "int8": trace the forward under kanvit.ops.quant.int8_serving() so
    # every TorchLinear dot (FF pairs, vanilla/flash projections, the head)
    # runs W8A8 on the int8 MXU (394.7 TOPs vs 197.4 bf16 TFLOPs on v5e;
    # measured 1.26-1.88x at ViT-B shapes, benchmarks/int8_matmul_probe.json).
    # Call .calibrate(images) first for STATIC activation scales — dynamic
    # per-call scales LOSE end-to-end (the max-reduce is a serialization
    # barrier; benchmarks/int8_static_probe.json: FF pair 1.95 ms dynamic
    # vs 1.29 static vs 1.90 bf16).
    quant: str | None = None

    def __post_init__(self):
        if self.quant not in (None, "int8"):
            raise ValueError(f"unknown quant mode {self.quant!r} (int8)")
        self._scales = None
        self._build()

    def _build(self):
        from kanvit.ops import quant as Q

        mb = self.microbatch

        def forward(params, x):
            if self.quant == "int8":
                with Q.int8_serving(self._scales):  # trace-time switch
                    return self.model.apply({"params": params}, x)
            return self.model.apply({"params": params}, x)

        if mb and mb < self.batch_size and self.batch_size % mb == 0:
            def apply_fn(params, x):
                chunks = x.reshape(x.shape[0] // mb, mb, *x.shape[1:])
                ys = jax.lax.map(lambda c: forward(params, c), chunks)
                return ys.reshape(-1, *ys.shape[2:])
        else:
            apply_fn = forward
        self._apply = jax.jit(apply_fn)

    def calibrate(self, images: np.ndarray, max_batches: int = 2) -> dict:
        """Capture per-layer activation maxima with jit-compiled float
        passes over up to ``max_batches`` batches (sown into the
        ``quant_amax`` mutable collection — one compiled program, so
        calibration costs one forward per batch even on tunneled
        transports), pin them as static int8 scales, and re-jit the
        quantized forward. Returns the scales dict."""
        from kanvit.ops import quant as Q

        if self.quant != "int8":
            raise ValueError("calibrate() only applies to quant='int8'")
        with Q.calibrating():  # trace-time flag
            fn = jax.jit(lambda p, c: self.model.apply(
                {"params": p}, c, mutable=["quant_amax"]
            ))
            amax: dict = {}
            n = min(len(images), self.batch_size * max_batches)
            for lo in range(0, n, self.batch_size):
                chunk = images[lo : lo + self.batch_size]
                pad = self.batch_size - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad, *chunk.shape[1:]),
                                         chunk.dtype)]
                    )
                _, mut = fn(self.params, jnp.asarray(chunk))
                for k, v in Q.amax_from_mutable(jax.device_get(mut)).items():
                    amax[k] = max(amax.get(k, 0.0), v)
        self._scales = Q.scales_from_amax(amax)
        self._build()  # re-jit with static scales baked in
        return self._scales

    def logits(self, images: np.ndarray) -> np.ndarray:
        """``(N, C, H, W) -> (N, out_d)`` — tail batch zero-padded so every
        call hits the same compiled program."""
        n = images.shape[0]
        out = []
        for lo in range(0, n, self.batch_size):
            chunk = images[lo : lo + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)]
                )
            y = self._apply(self.params, jnp.asarray(chunk))
            out.append(np.asarray(y[: self.batch_size - pad]))
        return np.concatenate(out) if out else np.zeros((0,))

    def predict(self, images: np.ndarray):
        """Returns ``(labels (N,), probabilities (N, out_d))``."""
        z = self.logits(images).astype(np.float64)
        z = z - z.max(-1, keepdims=True)
        probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
        return probs.argmax(-1), probs

    def export(self, path: str) -> dict:
        """AOT-export the serving program to ``path`` (StableHLO via
        ``jax.export``), weights baked in as constants, plus a ``.json``
        metadata sidecar. The artifact is self-contained: serve it with
        :func:`load_exported` (or raw ``jax.export.deserialize``) with no
        model code or checkpoint.

        Lowered for the CURRENT backend only: kernel dispatch
        (``kanvit.ops.dispatch``) decides Pallas-vs-jnp at trace time from
        ``jax.default_backend()``, so a cross-platform artifact would bake
        the exporting host's tier choices. Export on (or for) the machine
        class you serve on. An int8-calibrated Predictor exports the
        quantized program (the trace-time switch fires during export
        tracing exactly as it does under jit).
        """
        import json as _json

        from jax import export as jexport

        chw = tuple(self.model.chw)
        spec = jax.ShapeDtypeStruct((self.batch_size, *chw), jnp.float32)
        # Close over params: jax.export records closed-over arrays as
        # module constants — the weights ship inside the artifact.
        served = jax.jit(lambda x: self._apply(self.params, x))
        exported = jexport.export(served)(spec)
        blob = exported.serialize()
        with open(path, "wb") as f:
            f.write(blob)
        meta = {
            "format": "jax.export serialized Exported (StableHLO)",
            "model_type": getattr(self.model, "type", "flash-attn"),
            "input_shape": [self.batch_size, *chw],
            "out_d": int(self.model.out_d),
            "quant": self.quant,
            "microbatch": self.microbatch,
            "platforms": list(exported.platforms),
            "calling_convention_version":
                exported.calling_convention_version,
            "bytes": len(blob),
        }
        with open(path + ".json", "w") as f:
            _json.dump(meta, f, indent=2)
        return meta


class ExportedPredictor:
    """Serve from a ``Predictor.export`` artifact: same ``logits`` /
    ``predict`` surface, no model code, params, or re-trace — the program
    (with its baked-in weights and any int8 calibration) is deserialized
    straight from StableHLO and jit-invoked at its fixed batch shape,
    ragged tails padded exactly like :class:`Predictor`."""

    def __init__(self, exported):
        self._exported = exported
        in_aval = exported.in_avals[0]
        self.batch_size = int(in_aval.shape[0])
        self._in_shape = tuple(in_aval.shape)
        self._call = jax.jit(exported.call)

    def logits(self, images: np.ndarray) -> np.ndarray:
        n = images.shape[0]
        out = []
        for lo in range(0, n, self.batch_size):
            chunk = images[lo : lo + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)]
                )
            y = self._call(jnp.asarray(chunk, jnp.float32))
            out.append(np.asarray(y[: self.batch_size - pad]))
        return np.concatenate(out) if out else np.zeros((0,))

    predict = Predictor.predict


def load_exported(path: str) -> ExportedPredictor:
    """Load a ``Predictor.export`` artifact for serving."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    return ExportedPredictor(jexport.deserialize(blob))


def load_predictor(
    model_type: str,
    ckpt_dir: str,
    *,
    chw=(1, 28, 28),
    n_patches=7,
    n_blocks=8,
    d_hidden=64,
    n_heads=8,
    out_d=10,
    batch_size=256,
    microbatch=None,
    quant=None,
) -> Predictor:
    from kanvit.models import create_model
    from kanvit.train.checkpoint import latest_checkpoint, restore_params

    model = create_model(
        model_type, chw=chw, n_patches=n_patches, n_blocks=n_blocks,
        d_hidden=d_hidden, n_heads=n_heads, out_d=out_d,
    )
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, *chw), jnp.float32))["params"]
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    # Params-only restore: the checkpoint's opt_state may be any
    # make_optimizer chain (schedules/clip/decay) — inference must load
    # regardless of how the model was trained.
    params = restore_params(path, template)
    return Predictor(model, params, batch_size, microbatch, quant)


def main(argv=None):
    from kanvit.data.datasets import load_dataset
    from kanvit.train.loop import _dataset_model_config
    from kanvit.train.metrics import calculate_metrics

    p = argparse.ArgumentParser(description="kanvit inference")
    p.add_argument("--model-type", default="vanilla")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint directory (omit with --exported)")
    p.add_argument("--dataset", default="mnist",
                   choices=("mnist", "cifar100", "digits", "synthetic"))
    p.add_argument("--data-dir", default=None)
    p.add_argument("--n-blocks", type=int, default=8)
    p.add_argument("--d-hidden", type=int, default=64)
    p.add_argument("--n-heads", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--microbatch", type=int, default=None,
                   help="serve each batch as one jitted lax.map over chunks "
                        "of this size (fwd-optimal ~64 for large presets)")
    p.add_argument("--quant", default=None, choices=("int8",),
                   help="W8A8 int8 serving for the Linear compute path "
                        "(v5e int8 MXU)")
    p.add_argument("--calibrate", type=int, default=2, metavar="N",
                   help="with --quant int8: calibrate static activation "
                        "scales on N batches first (0 = dynamic scales; "
                        "dynamic is measured SLOWER than bf16)")
    p.add_argument("--export", default=None, metavar="PATH",
                   help="AOT-export the serving program (weights baked in) "
                        "to PATH after loading/calibrating, then exit")
    p.add_argument("--exported", default=None, metavar="PATH",
                   help="serve from a --export artifact instead of a "
                        "checkpoint (no model config needed)")
    p.add_argument("--out", default=None, help="write predictions npz here")
    args = p.parse_args(argv)

    x, y, num_classes = load_dataset(args.dataset, args.data_dir, train=False)
    if args.exported:
        pred = load_exported(args.exported)
    else:
        if not args.ckpt_dir:
            p.error("--ckpt-dir is required unless serving --exported")
        mcfg = _dataset_model_config(args.dataset)
        pred = load_predictor(
            args.model_type, args.ckpt_dir,
            chw=tuple(x.shape[1:]), n_patches=mcfg["n_patches"],
            n_blocks=args.n_blocks, d_hidden=args.d_hidden,
            n_heads=args.n_heads, out_d=num_classes,
            batch_size=args.batch_size,
            microbatch=args.microbatch, quant=args.quant,
        )
        if args.quant == "int8" and args.calibrate > 0:
            pred.calibrate(x, max_batches=args.calibrate)
        if args.export:
            meta = pred.export(args.export)
            print(json.dumps({"exported": args.export, **meta}))
            return
    labels, probs = pred.predict(x)
    acc, bal, f1, auc = calculate_metrics(y, labels, probs, num_classes)
    print(json.dumps({
        "accuracy": round(acc, 4), "balanced_accuracy": round(bal, 4),
        "f1": round(f1, 4), "roc_auc": round(auc, 4), "n": int(len(y)),
    }))
    if args.out:
        np.savez_compressed(args.out, labels=labels, probs=probs, y_true=y)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
