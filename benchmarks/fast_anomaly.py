"""Adjudicate the `fast` reference-workload anomaly (round-1 verdict #3).

Round-1 observation: at the reference trainer's CIFAR-100 recipe (8 blocks,
d=64, 8 heads, 100 classes — reference ``train.py:18-20,88-96``) kanvit's
`fast` variant scored 0.0098 test accuracy (sub-chance) on synthetic
CIFAR-shaped data, while being the best learner on digits. This script runs
the controlled experiment: the SAME torch-drawn init imported into kanvit
(``kanvit.utils.torch_compat``), the SAME synthetic dataset, the SAME batch
order, trained side by side in both frameworks — the methodology already
used for the sine study in docs/PARITY.md. If the executed PyTorch reference
also sits at chance, the collapse is replicated reference behavior at this
scale (d_head=8 FastKAN with internal LayerNorm on 100 classes); if torch
learns, kanvit has a scale-dependent bug.

Writes benchmarks/fast_anomaly.json with per-epoch train losses and final
test accuracy for both frameworks.

Usage: python benchmarks/fast_anomaly.py [--epochs 20] [--variant fast]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The reference trainer's exact model geometry (train.py:18-20,93-95).
GEOM = dict(chw=(3, 32, 32), n_patches=4, n_blocks=8, d_hidden=64,
            n_heads=8, out_d=100)


def _data(augment: bool = False):
    from kanvit.data.datasets import load_synthetic
    from kanvit.data.pipeline import CIFAR100_MEAN, CIFAR100_STD, normalize

    x_tr, y_tr = load_synthetic((3, 32, 32), 100, train=True)
    x_te, y_te = load_synthetic((3, 32, 32), 100, train=False)
    if not augment:
        x_tr = normalize(x_tr, CIFAR100_MEAN, CIFAR100_STD)
    x_te = normalize(x_te, CIFAR100_MEAN, CIFAR100_STD)
    return x_tr.astype(np.float32), y_tr, x_te.astype(np.float32), y_te


def _batch_stream(x_tr, y_tr, batch_size, epochs, seed, augment):
    """Deterministic per-epoch (x, y) batch lists, identical across both
    frameworks for a given seed. With --augment this is the trainer's own
    DataPipeline (flip + pad-4 crop + CIFAR normalize after augmentation) —
    the exact conditions of the reference-workload run."""
    if augment:
        from kanvit.data.pipeline import (
            CIFAR100_MEAN,
            CIFAR100_STD,
            DataPipeline,
        )

        pipe = DataPipeline(
            x_tr, y_tr, batch_size, shuffle=True, augment=True,
            normalize_stats=(CIFAR100_MEAN, CIFAR100_STD), seed=seed,
        )
        for _ in range(epochs):
            yield list(pipe)
        return
    n = len(x_tr)
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng.permutation(n)
        yield [
            (x_tr[order[lo: lo + batch_size]], y_tr[order[lo: lo + batch_size]])
            for lo in range(0, n - batch_size + 1, batch_size)
        ]


def run_kanvit(variant, sd, x_tr, y_tr, x_te, y_te, epochs, batch_size, seed,
               augment=False):
    """``sd=None`` keeps kanvit's own init draw (isolates init effects)."""
    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model
    from kanvit.train.state import create_train_state
    from kanvit.train.steps import make_train_step
    from kanvit.utils.torch_compat import params_from_torch_state_dict

    model = create_model(variant, **GEOM)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), jnp.zeros((1, *GEOM["chw"]))
    )
    if sd is not None:
        state = state.replace(
            params=jax.tree.map(jnp.asarray, params_from_torch_state_dict(sd))
        )
    step = make_train_step()
    losses = []
    for epoch_batches in _batch_stream(x_tr, y_tr, batch_size, epochs, seed,
                                       augment):
        ep = []
        for xb, yb in epoch_batches:
            state, loss, _ = step(state, jnp.asarray(xb), jnp.asarray(yb))
            ep.append(loss)
        losses.append(float(np.mean([float(l) for l in ep])))
        print(f"  kanvit epoch {len(losses)}: loss {losses[-1]:.4f}", flush=True)
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    pad = (-len(x_te)) % batch_size
    xp = np.concatenate([x_te, np.zeros((pad, *x_te.shape[1:]), x_te.dtype)])
    logits = np.concatenate([
        np.asarray(apply(state.params, jnp.asarray(xp[lo: lo + batch_size])))
        for lo in range(0, len(xp), batch_size)
    ])[: len(x_te)]
    return float((logits.argmax(-1) == y_te).mean()), losses


def run_torch(tmodel, x_tr, y_tr, x_te, y_te, epochs, batch_size, seed,
              augment=False):
    import torch

    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    crit = torch.nn.CrossEntropyLoss()
    losses = []
    tmodel.train()
    for epoch_batches in _batch_stream(x_tr, y_tr, batch_size, epochs, seed,
                                       augment):
        ep = []
        for xb, yb in epoch_batches:
            loss = crit(tmodel(torch.tensor(xb)),
                        torch.tensor(yb, dtype=torch.long))
            opt.zero_grad(); loss.backward(); opt.step()
            ep.append(float(loss.detach()))
        losses.append(float(np.mean(ep)))
        print(f"  torch epoch {len(losses)}: loss {losses[-1]:.4f}", flush=True)
    tmodel.eval()
    preds = []
    with torch.no_grad():
        for lo in range(0, len(x_te), batch_size):
            preds.append(tmodel(torch.tensor(x_te[lo: lo + batch_size])).argmax(-1).numpy())
    return float((np.concatenate(preds) == y_te).mean()), losses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--variant", default="fast")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-torch", action="store_true")
    p.add_argument("--init", choices=("torch", "kanvit"), default="torch",
                   help="'kanvit' keeps kanvit's own init (isolates init "
                        "effects); implies --skip-torch unless torch runs "
                        "its own draw")
    p.add_argument("--augment", action="store_true",
                   help="train through the trainer's DataPipeline "
                        "(flip + pad-4 crop + normalize), identical stream "
                        "in both frameworks — the reference-workload "
                        "conditions")
    args = p.parse_args()

    import torch

    sys.path.insert(0, os.environ.get("KANVIT_REFERENCE", "/root/reference"))
    from model import VisionTransformer

    torch.manual_seed(args.seed)
    tmodel = VisionTransformer(
        GEOM["chw"], n_patches=GEOM["n_patches"], n_blocks=GEOM["n_blocks"],
        d_hidden=GEOM["d_hidden"], n_heads=GEOM["n_heads"],
        out_d=GEOM["out_d"], type=args.variant,
    )
    sd = None if args.init == "kanvit" else {
        k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()
    }

    x_tr, y_tr, x_te, y_te = _data(args.augment)
    print(f"synthetic CIFAR-100: {len(x_tr)} train / {len(x_te)} test", flush=True)

    t0 = time.time()
    acc_k, losses_k = run_kanvit(
        args.variant, sd, x_tr, y_tr, x_te, y_te,
        args.epochs, args.batch_size, args.seed, args.augment,
    )
    t_k = time.time() - t0
    print(f"kanvit {args.variant}: test acc {acc_k:.4f} ({t_k:.0f}s)", flush=True)

    result = {
        "config": GEOM,
        "recipe": f"Adam 1e-3, CE, batch {args.batch_size}, "
                  f"{args.epochs} epochs, {args.init} init, same batch order",
        "dataset": "synthetic CIFAR-100-shaped (class prototypes + noise), "
                   "CIFAR normalization, "
                   + ("flip+crop augmentation (trainer pipeline)"
                      if args.augment else "no augmentation"),
        "variant": args.variant,
        "kanvit": {"test_accuracy": round(acc_k, 4),
                   "train_losses": [round(l, 4) for l in losses_k],
                   "seconds": round(t_k, 1)},
    }
    if not args.skip_torch:
        t0 = time.time()
        acc_r, losses_r = run_torch(
            tmodel, x_tr, y_tr, x_te, y_te, args.epochs, args.batch_size,
            args.seed, args.augment,
        )
        t_r = time.time() - t0
        print(f"torch {args.variant}: test acc {acc_r:.4f} ({t_r:.0f}s)", flush=True)
        result["reference"] = {"test_accuracy": round(acc_r, 4),
                               "train_losses": [round(l, 4) for l in losses_r],
                               "seconds": round(t_r, 1)}
        result["gap"] = round(acc_k - acc_r, 4)

    result["init"] = args.init
    result["augment"] = args.augment
    suffix = ("" if args.init == "torch" else "_kanvit_init") + (
        "_aug" if args.augment else ""
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"fast_anomaly{suffix}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
