"""End-to-end CLI tests: train one epoch on synthetic shards, then test.py
(incl. --ood and --submit) against the produced checkpoint."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from trajsde_tpu.data.synthetic import make_raw_scene

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
    TRAJSDE_FORCE_CPU="1",
)


def _make_data(tmp_path, rng):
    for name, src in (("nuScenes", 0), ("Argoverse", 1)):
        for split in ("train", "val"):
            d = tmp_path / "data" / name / split
            os.makedirs(d, exist_ok=True)
            for i in range(4):
                raw = make_raw_scene(rng, src, num_actors=5, num_lanes=6)
                np.savez(d / f"s{i}.npz", **raw)


def _make_config(tmp_path):
    cfg = yaml.safe_load(open("configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec.yml"))
    dm = cfg["datamodule_specific"]["kwargs"]
    dm["nu_dir"] = str(tmp_path / "data" / "nuScenes")
    dm["Argo_dir"] = str(tmp_path / "data" / "Argoverse")
    dm["train_batch_size"] = 4
    dm["val_batch_size"] = 4
    dm["num_actors"] = 6
    dm["num_lanes"] = 8
    dm["val_dataset_args"]["Argo"] = True  # val dir has both domains
    dm["test_dataset_args"]["Argo"] = True
    cfg["training_specific"]["max_epochs"] = 1
    path = tmp_path / "cfg.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.slow
def test_train_then_test_cli(tmp_path, rng):
    _make_data(tmp_path, rng)
    cfg = _make_config(tmp_path)
    logdir = str(tmp_path / "logs")

    r = subprocess.run(
        [sys.executable, "train.py", "-c", cfg, "-n", "smoke",
         "--epochs", "1", "--logdir", logdir],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt_dir = os.path.join(logdir, "smoke", "checkpoints")
    board = json.load(open(os.path.join(ckpt_dir, "leaderboard.json")))
    assert board and board[0]["metric"] is not None
    assert os.path.isdir(os.path.join(logdir, "smoke", "source_snapshot"))
    ckpt = board[0]["path"]

    r = subprocess.run(
        [sys.executable, "test.py", "-c", cfg, "--ckpt", ckpt, "--submit",
         "--num-actors", "6", "--num-lanes", "8"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    results = json.loads(r.stdout.strip().splitlines()[-1])
    assert "ADE_T" in results and np.isfinite(results["ADE_T"])

    # --wire is exact: the wire-format eval must reproduce the plain
    # run's metrics bit-for-bit (same key stream, same data order)
    r = subprocess.run(
        [sys.executable, "test.py", "-c", cfg, "--ckpt", ckpt, "--wire",
         "--num-actors", "6", "--num-lanes", "8"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    wire_results = json.loads(r.stdout.strip().splitlines()[-1])
    for k in ("ADE_T", "FDE_T", "MR_T"):
        assert wire_results[k] == results[k], (k, wire_results, results)

    # OOD scoring path end-to-end (--only-agent exercises the
    # stds_full/viz interaction: viz must get FULL-actor stds even when
    # metrics are agent-filtered)
    r = subprocess.run(
        [sys.executable, "test.py", "-c", cfg, "--ckpt", ckpt, "--ood",
         "--viz-ood", "--viz-limit", "1", "--only-agent",
         "--num-actors", "6", "--num-lanes", "8"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ood_results = json.loads(r.stdout.strip().splitlines()[-1])
    assert "agent_std_mean" in ood_results and ood_results["agent_std_mean"] >= 0
    viz_dir = os.path.join(os.path.dirname(ckpt_dir), "out", "viz_ood")
    assert os.listdir(viz_dir), "viz-ood produced no renderings"
    out_dir = os.path.join(os.path.dirname(ckpt_dir), "out")
    subs = [f for f in os.listdir(out_dir) if f.startswith("submission_")]
    assert subs
    sub = np.load(os.path.join(out_dir, subs[0]))
    assert sub["trajectories"].shape[1:] == (10, 60, 2)

    # serving engine (fused Pallas rollout, interpret mode on CPU)
    r = subprocess.run(
        [sys.executable, "test.py", "-c", cfg, "--ckpt", ckpt, "--serving",
         "--num-actors", "6", "--num-lanes", "8"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    serve_results = json.loads(r.stdout.strip().splitlines()[-1])
    assert "ADE_T" in serve_results and np.isfinite(serve_results["ADE_T"])
    # same checkpoint, same metric space: the engines must agree closely
    # (stochastic rollouts differ per-path, so compare loosely)
    assert abs(serve_results["ADE_T"] - results["ADE_T"]) < max(
        2.0, 0.25 * results["ADE_T"]
    )

    # --serving --ood composes: OOD ensemble scoring through the fused
    # serving engine (predictions decode from the ensemble mean)
    r = subprocess.run(
        [sys.executable, "test.py", "-c", cfg, "--ckpt", ckpt, "--serving",
         "--ood", "--num-actors", "6", "--num-lanes", "8"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    so = json.loads(r.stdout.strip().splitlines()[-1])
    assert "agent_std_mean" in so and so["agent_std_mean"] > 0
    assert "ADE_T" in so and np.isfinite(so["ADE_T"])
