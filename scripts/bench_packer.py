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


if __name__ == "__main__":
    main()
