"""Micro-benchmark: native C++ packer vs the numpy path (host-side)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from trajsde_tpu import runtime
from trajsde_tpu.data.grid import align_to_grid
from trajsde_tpu.data.pack import pack_scenes
from trajsde_tpu.data.synthetic import make_raw_scene


def main():
    rng = np.random.default_rng(0)
    scenes = [
        align_to_grid(make_raw_scene(rng, s % 2, num_actors=40, num_lanes=160))
        for s in range(128)
    ]
    assert runtime.available(), "native packer unavailable"

    for name, native in (("numpy", False), ("native C++", True)):
        pack_scenes(scenes, 48, 192, as_jax=False, use_native=native)  # warm
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            pack_scenes(scenes, 48, 192, as_jax=False, use_native=native)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:.1f} ms / 128-scene batch "
              f"({128 / dt:.0f} scenes/s/core)")


def loader_throughput():
    """End-to-end input pipeline (npz read → grid → flip → pack) at the
    production batch shape B=128 / A=48 / L=192 — must sustain less than
    the ~80 ms TPU step time per batch to keep the chip fed."""
    import tempfile

    from trajsde_tpu.data.loader import BatchLoader, NuArgoDataset

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        d = os.path.join(tmp, "Argoverse", "train")
        os.makedirs(d)
        for i in range(256):
            raw = make_raw_scene(rng, 1, num_actors=40, num_lanes=160)
            np.savez(os.path.join(d, f"s{i:04d}.npz"), **raw)
        from trajsde_tpu.data.shards import convert_npz_dir

        sh = os.path.join(tmp, "shards", "Argoverse", "train")
        convert_npz_dir(d, sh)

        for fmt, root in (("npz", "Argoverse"), ("shard", "shards/Argoverse")):
            ds = NuArgoDataset(
                "train", argo_dir=os.path.join(tmp, root), nus=False,
                random_flip=True,
            )
            for workers in (1, 2, 4):
                loader = BatchLoader(
                    ds, batch_size=128, num_actors=48, num_lanes=192,
                    num_workers=workers, shuffle=True,
                )
                list(loader)  # warm the page cache
                t0 = time.perf_counter()
                n = sum(1 for _ in loader)
                dt = (time.perf_counter() - t0) / n
                print(
                    f"loader fmt={fmt} workers={workers}: {dt * 1e3:.1f} ms / "
                    f"128-scene batch ({128 / dt:.0f} scenes/s)"
                )


if __name__ == "__main__":
    main()
    loader_throughput()
