"""Multi-host training over a real 2-process jax.distributed CPU cluster.

The reference has no distributed backend at all (SURVEY §2.10). kanvit's
multi-host path is ``jax.distributed.initialize`` + the same mesh code as
single-host, with each process feeding its ``process_batch_slice`` of the
global batch. This test spawns TWO actual processes (Gloo collectives over
localhost), runs the full trainer in both, and asserts they agree.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # real subprocess clusters, minutes each

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from kanvit.cli import main
summary = main([
    "--coordinator-address", {coord!r},
    "--num-processes", "2",
    "--process-id", {pid!r},
    "--dataset", "synthetic", "--epochs", "1", "--batch-size", "16",
    "--n-blocks", "1", "--n-heads", "2", "--d-hidden", "32",
    "--limit-train-batches", "4", "--limit-eval-batches", "2",
    "--log-dir", {log_dir!r},
] + {extra!r})
print("SUMMARY:" + json.dumps({{k: summary[k] for k in
    ("train_loss", "test_loss", "test_accuracy")}}))
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(tmp_path, extra=(), tag=""):
    """Run the trainer in a real 2-process jax.distributed CPU cluster
    (2 local devices per process -> 4 global). Returns per-process summaries."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(
                repo=REPO, coord=coord, pid=str(i),
                log_dir=str(tmp_path / f"logs{tag}{i}"),
                extra=list(extra),
            )],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-2000:]}\n{err[-2000:]}"
    summaries = []
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith("SUMMARY:")][0]
        summaries.append(json.loads(line[len("SUMMARY:"):]))
    return summaries


def test_two_process_cpu_cluster(tmp_path):
    summaries = _run_cluster(tmp_path)
    # Both controllers executed the same SPMD program over a global 4-device
    # mesh: the replicated metrics must agree bit-for-bit.
    assert summaries[0] == summaries[1]
    assert all(s["train_loss"] > 0 for s in summaries)
    # proc 0 wrote the metrics artifact; proc 1 did not.
    logs0 = os.listdir(tmp_path / "logs0")
    assert any(f.endswith(".txt") for f in logs0)
    logs1 = os.listdir(tmp_path / "logs1")
    assert not any(f.endswith(".txt") for f in logs1)


def test_cluster_tensor_parallel_checkpoint_resume(tmp_path):
    """Checkpoint + resume under multi-host TENSOR parallelism: with
    model-sharded params spanning hosts, saving must all-gather before
    device_get (loop.py gather_state) — a bare device_get on proc 0 would
    hit non-addressable shards and throw."""
    ckpt = str(tmp_path / "ckpt")
    tp = ["--n-model-shards", "2", "--ckpt-dir", ckpt]
    s1 = _run_cluster(tmp_path, extra=tp, tag="a")
    assert s1[0] == s1[1]
    assert os.path.exists(os.path.join(ckpt, "latest"))
    # Second run resumes from the proc-0-written checkpoint on both procs
    # (restore -> shard_state re-placement onto the 2-host (2, 2) mesh).
    s2 = _run_cluster(tmp_path, extra=tp + ["--resume"], tag="b")
    assert s2[0] == s2[1]
    # Resumed run continued from trained params: losses must differ from the
    # fresh run's (same data order, different starting point).
    assert s2[0]["train_loss"] != s1[0]["train_loss"]


def test_process_batch_slice_single_process():
    from kanvit.parallel.distributed import process_batch_slice

    per, off = process_batch_slice(64)
    assert (per, off) == (64, 0)
