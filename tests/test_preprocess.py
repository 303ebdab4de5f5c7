"""Preprocessing geometry tests (devkit-free) + fake-provider end-to-end."""
import numpy as np

from trajsde_tpu.data.grid import align_to_grid
from trajsde_tpu.data.pack import pack_scenes
from trajsde_tpu.data.preprocess import common
from trajsde_tpu.data.preprocess.argoverse import ArgoversePreprocessor, process_scene


def test_scene_frame_rotation():
    rot, theta = common.scene_frame(np.zeros(2), np.array([0.0, 1.0]))
    assert abs(theta - np.pi / 2) < 1e-6
    # a point ahead of the AV maps onto +x in scene frame: (0,1) @ R = (1, 0)
    p = common.to_scene(np.array([[0.0, 1.0]]), np.zeros(2), rot)
    np.testing.assert_allclose(p, [[1.0, 0.0]], atol=1e-6)


def test_build_tracks_rules():
    # actor 0: full track; actor 1: missing ref step; actor 2: 1 hist obs
    steps = [np.arange(6), np.array([0, 1, 4, 5]), np.array([3, 4, 5])]
    xy = [np.cumsum(np.ones((len(s), 2)), 0) for s in steps]
    out = common.build_tracks(steps, xy, num_past=4, num_future=2,
                              origin=np.zeros(2), rot=np.eye(2, dtype=np.float32))
    assert not out["padding_mask"][0].any()
    # actor 1 unseen at ref step (3) ⇒ future fully masked
    assert out["padding_mask"][1, 3] and out["padding_mask"][1, 4:].all()
    # actor 2 has a single historical obs ⇒ future masked
    assert out["padding_mask"][2, 4:].all()
    # bos at first valid step
    assert out["bos_mask"][0, 0] and out["bos_mask"][2, 3]
    # x is relative to the ref position, zero at padding
    np.testing.assert_allclose(out["x"][0, 3], 0.0, atol=1e-6)


def test_resample_polyline_spacing():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    pts = common.resample_polyline(line)
    assert pts.shape == (11, 2)
    np.testing.assert_allclose(pts[:, 0], np.arange(11), atol=1e-6)
    diag = np.array([[0.0, 0.0], [3.0, 4.0]])  # length 5
    pts = common.resample_polyline(diag)
    assert pts.shape == (6, 2)
    np.testing.assert_allclose(np.linalg.norm(np.diff(pts, axis=0), axis=-1), 1.0, atol=1e-6)


def test_chunk_centerline_reference_rule():
    pts = common.resample_polyline(np.array([[0.0, 0.0], [25.0, 0.0]]))  # 26 poses
    segs = common.chunk_centerline(pts, lseg_len=10)
    # ceil(26/11)=3 segments, ceil(26/3)=9 poses each → counts 8,8,7
    assert [s["count"] for s in segs] == [8, 8, 7]
    # vectors never span chunk boundaries (2 boundary gaps dropped): 23 m
    total_vec = np.concatenate([s["vectors"] for s in segs])
    np.testing.assert_allclose(total_vec.sum(0)[0], 23.0, atol=1e-6)


def test_assign_goal_lanes_distance_and_angle():
    segs = common.chunk_centerline(
        common.resample_polyline(np.array([[0.0, 0.0], [10.0, 0.0]]))
    )
    segs += common.chunk_centerline(
        common.resample_polyline(np.array([[0.0, 5.0], [0.0, 15.0]]))
    )
    goal_pos = np.array([[5.0, 0.5], [0.0, 20.0], [5.0, 0.5]])
    goal_diff = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])  # 3rd: wrong heading
    goal_mask = np.array([True, True, True])
    onehot, has_goal = common.assign_goal_lanes(goal_pos, goal_diff, goal_mask, segs)
    assert has_goal[0] and onehot[0, 0] == 1.0          # nearest x-lane segment
    assert not has_goal[1]                               # 5 m away > 2.5 m
    assert not has_goal[2]                               # heading off by 90°


def test_argoverse_pipeline_with_fake_lane_provider(rng, tmp_path):
    """CSV → scene → grid → pack end-to-end with a synthetic map."""
    import pandas as pd

    ts = np.arange(50) * 0.1
    rows = []
    for tid, typ in [("av", "AV"), ("agent", "AGENT"), ("o1", "OTHERS")]:
        v = rng.uniform(-5, 5, 2)
        p0 = rng.uniform(-10, 10, 2)
        for i, t in enumerate(ts):
            if typ == "OTHERS" and i < 10:
                continue
            p = p0 + v * i * 0.1
            rows.append(dict(TIMESTAMP=t, TRACK_ID=tid, OBJECT_TYPE=typ,
                             X=p[0], Y=p[1], CITY_NAME="PIT"))
    csv = tmp_path / "1.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    def fake_lanes(positions, city, radius=80.0):
        return [np.array([[x, -20.0], [x, 20.0]], np.float32) for x in (-10.0, 0.0, 10.0)]

    pre = ArgoversePreprocessor(str(tmp_path), str(tmp_path / "out"), lane_provider=fake_lanes)
    assert pre.run() == 1
    scene = dict(np.load(tmp_path / "out" / "1.npz"))
    assert scene["x"].shape[1] == 20 and scene["y"].shape[1] == 30
    g = align_to_grid(scene)
    batch = pack_scenes([g], num_actors=4, num_lanes=16, as_jax=False)
    assert bool(batch.actor_valid[0, batch.agent_index[0]])
    assert batch.lane_valid[0].sum() > 0
