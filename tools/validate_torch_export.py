"""End-to-end export validation: kanvit-trained weights -> the EXECUTED
PyTorch reference.

Trains a few kanvit steps per variant, exports via
``torch_state_dict_from_params``, loads the state_dict into the actual
reference ``VisionTransformer`` (``/root/reference/model.py:49``,
``load_state_dict(..., strict=False)`` — the missing keys are exactly the
constructor-derived buffers torch regenerates), and compares reference
logits against kanvit logits on the same inputs.

Writes benchmarks/torch_export_validation.json.
Usage: JAX_PLATFORM_NAME=cpu python tools/validate_torch_export.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("KANVIT_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

import torch  # noqa: E402

from model import VisionTransformer  # noqa: E402  (the reference)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kanvit.models import create_model  # noqa: E402
from kanvit.train.state import create_train_state  # noqa: E402
from kanvit.train.steps import make_train_step  # noqa: E402
from kanvit.utils.torch_compat import (  # noqa: E402
    torch_state_dict_from_params,
)

# fourier/cheby ViT construction crashes in the reference (SURVEY §2.9.1-2),
# so only the five reference-constructible variants can round-trip into it.
VARIANTS = ["vanilla", "efficientkan", "fast", "sine", "flash-attn"]
CHW, NP_, NB, D, H, OUT = (1, 28, 28), 7, 2, 64, 2, 10


def main():
    results = {}
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(4, *CHW)).astype(np.float32)
    for variant in VARIANTS:
        model = create_model(variant, chw=CHW, n_patches=NP_, n_blocks=NB,
                             d_hidden=D, n_heads=H, out_d=OUT)
        state = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, *CHW))
        )
        # A couple of real optimizer steps so the exported weights are
        # genuinely kanvit-trained, not just kanvit-initialized.
        step = make_train_step(donate=False)
        xb = jnp.asarray(rng.normal(size=(8, *CHW)).astype(np.float32))
        yb = jnp.asarray(rng.integers(0, OUT, size=(8,)))
        for _ in range(3):
            state, _, _ = step(state, xb, yb)

        sd = torch_state_dict_from_params(
            jax.tree.map(np.asarray, state.params)
        )
        tmodel = VisionTransformer(CHW, n_patches=NP_, n_blocks=NB,
                                   d_hidden=D, n_heads=H, out_d=OUT,
                                   type=variant)
        missing, unexpected = tmodel.load_state_dict(
            {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
            strict=False,
        )
        assert not unexpected, f"{variant}: unexpected keys {unexpected}"
        # Every missing key must be a constructor-derived buffer.
        bad = [k for k in missing
               if not k.endswith((".grid", ".phase", ".arange"))
               and k != "pos_embeddings"
               and ".rbf." not in k and ".grid" not in k]
        assert not bad, f"{variant}: missing non-buffer keys {bad}"

        tmodel.eval()
        with torch.no_grad():
            y_ref = tmodel(torch.from_numpy(x_np)).numpy()
        y_kan = np.asarray(
            model.apply({"params": state.params}, jnp.asarray(x_np))
        )
        err = float(np.abs(y_ref - y_kan).max())
        results[variant] = {
            "max_abs_logit_err": err,
            "missing_buffers": sorted(missing),
            "n_exported": len(sd),
        }
        print(f"{variant:14s} exported={len(sd):3d} "
              f"max|ref-kanvit| logit err = {err:.2e}", flush=True)
        assert err < 1e-3, f"{variant}: exported-weights parity broke ({err})"

    path = os.path.join(REPO, "benchmarks", "torch_export_validation.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
