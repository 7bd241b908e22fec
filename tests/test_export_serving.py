"""AOT serving export (``Predictor.export`` / ``load_exported``): the
deserialized StableHLO artifact must reproduce the live Predictor exactly
— float, microbatched, and int8-calibrated — with no model code or params
at load time. The reference has no inference path at all
(``/root/reference/train.py`` is train-only); this is kanvit serving
infrastructure."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from kanvit.infer import ExportedPredictor, Predictor, load_exported
from kanvit.models import create_model


def _tiny(variant="vanilla", **kw):
    model = create_model(
        variant, chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=32, n_heads=4, out_d=10,
    )
    x = np.random.default_rng(0).normal(size=(24, 1, 28, 28)).astype(
        np.float32
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]
    return model, params, x


def test_export_roundtrip_matches_live_predictor(tmp_path):
    model, params, x = _tiny()
    pred = Predictor(model, params, batch_size=16)
    path = str(tmp_path / "vanilla.kanvit")
    meta = pred.export(path)

    assert os.path.exists(path) and os.path.exists(path + ".json")
    assert meta["input_shape"] == [16, 1, 28, 28]
    assert meta["out_d"] == 10

    served = load_exported(path)
    assert isinstance(served, ExportedPredictor)
    assert served.batch_size == 16
    # Bit-identical program on the same backend: logits match exactly,
    # including the padded ragged tail (24 = 16 + 8).
    np.testing.assert_allclose(
        served.logits(x), pred.logits(x), rtol=0, atol=1e-6
    )
    lab_s, prob_s = served.predict(x)
    lab_p, prob_p = pred.predict(x)
    np.testing.assert_array_equal(lab_s, lab_p)
    np.testing.assert_allclose(prob_s, prob_p, atol=1e-6)


def test_export_bakes_int8_calibration(tmp_path):
    """Exporting a calibrated int8 Predictor serializes the QUANTIZED
    program (static scales baked as constants): the artifact reproduces
    the int8 forward, not the float one."""
    model, params, x = _tiny()
    p_f32 = Predictor(model, params, batch_size=16)
    p_q = Predictor(model, params, batch_size=16, quant="int8")
    p_q.calibrate(x, max_batches=1)

    path = str(tmp_path / "vanilla_int8.kanvit")
    meta = p_q.export(path)
    assert meta["quant"] == "int8"

    served = load_exported(path)
    z_served = served.logits(x)
    np.testing.assert_allclose(z_served, p_q.logits(x), rtol=0, atol=1e-6)
    # ... and it is genuinely the quantized program, not the float one.
    assert np.abs(z_served - p_f32.logits(x)).max() > 1e-4


def test_export_microbatched_program(tmp_path):
    model, params, x = _tiny()
    pred = Predictor(model, params, batch_size=16, microbatch=8)
    path = str(tmp_path / "vanilla_mb.kanvit")
    pred.export(path)
    served = load_exported(path)
    np.testing.assert_allclose(
        served.logits(x), pred.logits(x), rtol=0, atol=1e-6
    )


def test_infer_cli_export_then_serve(tmp_path):
    """`python -m kanvit.infer --export` then `--exported`: the full CLI
    round trip on the synthetic dataset."""
    import json

    from kanvit.train.checkpoint import save_checkpoint
    from kanvit.train.state import create_train_state

    from kanvit import infer

    model = create_model(
        "vanilla", chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=32, n_heads=4, out_d=10,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 1, 28, 28))
    )
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir)
    save_checkpoint(ckpt_dir, state, step=0)

    art = str(tmp_path / "m.kanvit")
    infer.main([
        "--model-type", "vanilla", "--ckpt-dir", ckpt_dir,
        "--dataset", "synthetic", "--n-blocks", "2", "--d-hidden", "32",
        "--n-heads", "4", "--batch-size", "16", "--export", art,
    ])
    assert os.path.exists(art)
    meta = json.load(open(art + ".json"))
    assert meta["input_shape"][0] == 16

    infer.main(["--exported", art, "--dataset", "synthetic"])
