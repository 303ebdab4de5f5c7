"""Production end-to-end soak: real pipeline, real TPU, synthetic scenes.

Reproduces the PERF.md "production end-to-end soak" (the reference's
headline regime: nuScenes+Argoverse mix at A=48 / L=192,
``configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec_tpu.yml``) with a
repeatable script instead of a heredoc.  ``--fmt shard`` converts the
generated per-scene ``.npz`` files to packed shards (``data/shards.py``)
first — the host-side loader format that sustains >2000 scenes/s on this
single-CPU box vs ~600 for npz, which is the difference between a
host-bound and a device-bound soak.

    python scripts/soak_production.py --fmt shard --epochs 3

Prints one summary line per epoch from the run's metrics.jsonl plus the
steady-state step cadence.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def generate(root: str, n_train: int, n_val: int, fmt: str) -> None:
    from trajsde_tpu.data.synthetic import make_raw_scene

    rng = np.random.default_rng(0)
    for domain, sub in ((0, "nuScenes"), (1, "Argoverse")):
        for split, n in (("train", n_train // 2), ("val", n_val // 2)):
            d = os.path.join(root, sub, split)
            os.makedirs(d)
            for i in range(n):
                raw = make_raw_scene(rng, domain, num_actors=40, num_lanes=160)
                np.savez(os.path.join(d, f"s{i:05d}.npz"), **raw)
            if fmt == "shard":
                from trajsde_tpu.data.shards import convert_npz_dir

                sh = os.path.join(root, "sharded", sub, split)
                convert_npz_dir(d, sh)
                shutil.rmtree(d)
                shutil.move(sh, d)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--fmt", choices=["npz", "shard"], default="shard")
    p.add_argument("--wire", action="store_true",
                   help="pack batches to one transfer buffer per dtype "
                        "(train.py --wire)")
    p.add_argument("--chain", type=int, default=1,
                   help="forwarded to train.py --chain (dispatch chaining)")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--train-scenes", type=int, default=1280)
    p.add_argument("--val-scenes", type=int, default=256)
    p.add_argument(
        "--config",
        default="configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec_tpu.yml",
    )
    args = p.parse_args()

    import yaml

    with tempfile.TemporaryDirectory() as tmp:
        data_root = os.path.join(tmp, "data")
        t0 = time.time()
        generate(data_root, args.train_scenes, args.val_scenes, args.fmt)
        print(f"generated {args.train_scenes}+{args.val_scenes} scenes "
              f"({args.fmt}) in {time.time() - t0:.1f}s")

        with open(args.config) as f:
            cfg = yaml.safe_load(f)
        dm = cfg["datamodule_specific"]["kwargs"]
        dm["nu_dir"] = os.path.join(data_root, "nuScenes")
        dm["Argo_dir"] = os.path.join(data_root, "Argoverse")
        cfg_path = os.path.join(tmp, "soak.yml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)

        run_root = os.path.join(tmp, "logs")
        t0 = time.time()
        subprocess.run(
            [
                sys.executable, "train.py", "-c", cfg_path,
                "-n", "soak", "--logdir", run_root,
                "--epochs", str(args.epochs), "--log-every", "2",
                "--chain", str(args.chain),
            ] + (["--wire"] if args.wire else []),
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        wall = time.time() - t0

        jsonl = os.path.join(run_root, "soak", "metrics.jsonl")
        step_ts = []
        with open(jsonl) as f:
            for line in f:
                rec = json.loads(line)
                if "perf/scenes_per_s" in rec:
                    print(
                        f"epoch step={rec['step']}: "
                        f"{rec['perf/scenes_per_s']:.0f} scenes/s "
                        f"({rec.get('perf/compiled_steps', 0):.0f} "
                        "compiled steps)"
                    )
                for k in rec:
                    if k.startswith("val/"):
                        print(f"  {k}={rec[k]:.3f}", end="")
                if any(k.startswith("val/") for k in rec):
                    print()
                if "train/total" in rec:
                    step_ts.append((rec["step"], rec["time"]))
        # per-pair ms/step over consecutive train records; the median is
        # robust to the few pairs that straddle an epoch boundary (val
        # pass + checkpoint write inflate those)
        pairs = [
            (t1 - t0) / (s1 - s0) * 1e3
            for (s0, t0), (s1, t1) in zip(step_ts, step_ts[1:])
            if s1 > s0
        ]
        if pairs:
            print(
                f"steady-state cadence: median {np.median(pairs):.0f} ms/step "
                f"(over {len(pairs)} record pairs)"
            )
        print(f"total wall (incl. compile): {wall:.1f}s")


if __name__ == "__main__":
    main()
