"""CLI surface: the reference's flag names and defaults must be preserved
(reference ``train.py:86-97``)."""

from kanvit.cli import build_parser


def test_reference_flag_defaults():
    args = build_parser().parse_args([])
    # Reference defaults, verbatim (train.py:88-96)
    assert args.epochs == 20
    assert args.batch_size == 128
    assert args.learning_rate == 0.001
    assert args.model_type == "vanilla"
    assert args.n_blocks == 8
    assert args.d_hidden == 64
    assert args.n_heads == 8
    assert args.log_dir == "logs"


def test_extension_flags_parse():
    args = build_parser().parse_args(
        ["--dataset", "mnist", "--bf16", "--ckpt-dir", "c", "--resume",
         "--n-model-shards", "2", "--seed", "7", "--h2d-lookahead", "3",
         "--device", "cpu", "--weight-decay", "0.05",
         "--clip-grad-norm", "1.0"]
    )
    assert args.dataset == "mnist" and args.bf16 and args.resume
    assert args.n_model_shards == 2 and args.seed == 7
    assert args.h2d_lookahead == 3 and args.device == "cpu"
    assert args.weight_decay == 0.05 and args.clip_grad_norm == 1.0


def test_all_variants_accepted():
    for vt in ["vanilla", "efficientkan", "fast", "sine", "fourier", "cheby",
               "flash-attn"]:
        args = build_parser().parse_args(["--model-type", vt])
        assert args.model_type == vt


def test_config_cross_flag_guards():
    """Silently-wrong flag combos must fail loudly before any work:
    unsupported PP x TP geometries (flash-attn blocks, indivisible
    heads), and --n-microbatches without a pipeline (a no-op)."""
    import pytest

    from kanvit.train.loop import TrainConfig, _validate_config

    with pytest.raises(ValueError, match="n-microbatches"):
        _validate_config(TrainConfig(n_microbatches=4))
    with pytest.raises(ValueError, match="flash-attn"):
        _validate_config(TrainConfig(n_pipe_stages=2, n_model_shards=2,
                                     model_type="flash-attn"))
    with pytest.raises(ValueError, match="not divisible"):
        _validate_config(TrainConfig(n_pipe_stages=2, n_model_shards=3,
                                     n_heads=8))
    # Supported PP x TP geometry validates clean.
    _validate_config(TrainConfig(n_pipe_stages=2, n_model_shards=2,
                                 n_heads=8, d_hidden=64))
    _validate_config(TrainConfig(n_pipe_stages=2, n_microbatches=4))
