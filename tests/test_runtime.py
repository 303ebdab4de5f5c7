"""Native C++ packer: build, ABI, and parity with the numpy path."""
import numpy as np
import pytest

from trajsde_tpu import runtime
from trajsde_tpu.data.grid import align_to_grid
from trajsde_tpu.data.pack import pack_scenes
from trajsde_tpu.data.synthetic import make_raw_scene


def test_native_packer_builds():
    assert runtime.available(), "C++ packer failed to build/load"


FIELDS = (
    "x", "y", "positions", "padding_mask", "bos_mask", "rotate_angles",
    "actor_valid", "agent_index", "av_index", "source",
    "lane_positions", "lane_paddings", "lane_valid",
)


def test_native_matches_numpy_fuzz():
    """Property fuzz over the ragged envelope the C ABI must handle:
    per-scene actor/lane counts above AND below capacity (truncation +
    padding), mixed sources, mixed per-scene lane-pose widths vs the
    destination S (s_src <> s_dst), and test-split scenes (y=None,
    per-scene has_y flags) mixed with labeled ones."""
    rng = np.random.default_rng(1234)
    for trial in range(12):
        nb = int(rng.integers(1, 6))
        scenes = []
        for _ in range(nb):
            s = make_raw_scene(
                rng,
                source=int(rng.integers(0, 2)),
                num_actors=int(rng.integers(2, 17)),
                num_lanes=int(rng.integers(1, 31)),
                lane_poses=int(rng.choice([7, 10, 13])),
            )
            s = align_to_grid(s)
            if rng.uniform() < 0.3:
                s["y"] = None
            scenes.append(s)
        kw = dict(
            num_actors=int(rng.integers(2, 21)),
            num_lanes=int(rng.integers(1, 41)),
            as_jax=False,
        )
        a = pack_scenes(scenes, use_native=True, **kw)
        b = pack_scenes(scenes, use_native=False, **kw)
        for field in FIELDS:
            va, vb = getattr(a, field), getattr(b, field)
            if va is None and vb is None:
                continue
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(vb),
                err_msg=f"trial {trial}: mismatch in {field} (kw={kw})",
            )


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
