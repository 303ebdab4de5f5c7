"""Native C++ packer: build, ABI, and parity with the numpy path."""
import numpy as np
import pytest

from trajsde_tpu import runtime
from trajsde_tpu.data.grid import align_to_grid
from trajsde_tpu.data.pack import pack_scenes
from trajsde_tpu.data.synthetic import make_raw_scene


def test_native_packer_builds():
    assert runtime.available(), "C++ packer failed to build/load"


@pytest.mark.parametrize("source", [0, 1])
def test_native_matches_numpy(rng, source):
    scenes = [
        align_to_grid(make_raw_scene(rng, source, num_actors=10, num_lanes=20))
        for _ in range(3)
    ]
    a = pack_scenes(scenes, num_actors=6, num_lanes=12, as_jax=False, use_native=True)
    b = pack_scenes(scenes, num_actors=6, num_lanes=12, as_jax=False, use_native=False)
    for field in (
        "x", "y", "positions", "padding_mask", "bos_mask", "rotate_angles",
        "actor_valid", "agent_index", "av_index", "source",
        "lane_positions", "lane_paddings", "lane_valid",
    ):
        va, vb = getattr(a, field), getattr(b, field)
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=f"mismatch in {field}"
        )
