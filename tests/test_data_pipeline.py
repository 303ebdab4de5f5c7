"""Data pipeline tests: grid alignment, augmentation, packing, loading."""
import os

import numpy as np
import pytest

from trajsde_tpu.data.augment import random_flip
from trajsde_tpu.data.grid import TF, TH, align_to_grid, domain_slot_masks
from trajsde_tpu.data.loader import BatchLoader, DataModuleNuArgoMix, NuArgoDataset
from trajsde_tpu.data.pack import pack_scenes
from trajsde_tpu.data.synthetic import make_raw_scene


def test_grid_slot_masks_match_reference():
    """Slot layouts from ``nuScenes_Argoverse.py:91-103``."""
    past, fut = domain_slot_masks(0)  # nuScenes
    assert list(np.nonzero(past)[0]) == [0, 5, 10, 15, 20]
    assert list(np.nonzero(fut)[0]) == [4, 9, 14, 19, 24, 29, 34, 39, 44, 49, 54, 59]
    past, fut = domain_slot_masks(1)  # Argoverse
    assert list(np.nonzero(past)[0]) == list(range(1, 21))
    assert list(np.nonzero(fut)[0]) == list(range(30))


def test_align_to_grid_roundtrip(rng):
    for source in (0, 1):
        raw = make_raw_scene(rng, source)
        g = align_to_grid(raw)
        N = raw["x"].shape[0]
        assert g["x"].shape == (N, TH, 2)
        assert g["y"].shape == (N, TF, 2)
        assert g["padding_mask"].shape == (N, TH + TF)
        past, fut = domain_slot_masks(source)
        # values land on the right slots, with nuScenes ÷5 scaling on x only
        scale = 5.0 if source == 0 else 1.0
        np.testing.assert_allclose(g["x"][:, past], raw["x"] / scale, rtol=1e-6)
        np.testing.assert_allclose(g["y"][:, fut], raw["y"], rtol=1e-6)
        # off-grid slots stay padded/zero
        assert g["padding_mask"][:, :TH][:, ~past].all()
        np.testing.assert_array_equal(g["x"][:, ~past], 0.0)


def test_align_delta_targets(rng):
    raw = make_raw_scene(rng, 1)
    g_abs = align_to_grid(raw, is_gtabs=True)
    g_del = align_to_grid(raw, is_gtabs=False)
    _, fut = domain_slot_masks(1)
    # delta targets cumsum back to absolute on the native slots
    np.testing.assert_allclose(
        np.cumsum(g_del["y"][:, fut], axis=1),
        g_abs["y"][:, fut],
        rtol=1e-4,
        atol=1e-4,
    )


def test_category_interest_masks_whole_track(rng):
    raw = make_raw_scene(rng, 0)
    raw["category"] = np.full(raw["x"].shape[0], 6, np.int32)  # not of interest
    g = align_to_grid(raw)
    # nuScenes domain width (17) < 60 ⇒ the reference's [-60:] slice pads
    # the ENTIRE track of non-interest actors
    assert g["padding_mask"].all()


def test_random_flip_consistency(rng):
    raw = align_to_grid(make_raw_scene(rng, 1))

    class FlipRng:
        def integers(self, lo, hi):
            return 1  # force both flips

    f = random_flip(raw, FlipRng())
    np.testing.assert_allclose(f["positions"], -raw["positions"], rtol=1e-6)
    # heading angles rotate consistently: cos/sin negate
    np.testing.assert_allclose(
        np.cos(f["rotate_angles"]), -np.cos(raw["rotate_angles"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.sin(f["rotate_angles"]), -np.sin(raw["rotate_angles"]), atol=1e-6
    )


def test_pack_scenes_truncation_and_remap(rng):
    scenes = [align_to_grid(make_raw_scene(rng, s, num_actors=12)) for s in (0, 1)]
    batch = pack_scenes(scenes, num_actors=6, num_lanes=8, as_jax=False)
    assert batch.x.shape == (2, 6, TH, 2)
    assert batch.lane_positions.shape == (2, 8, 10, 2)
    # agent survives truncation and is remapped to a valid slot
    for b in range(2):
        a = int(batch.agent_index[b])
        assert bool(batch.actor_valid[b, a])
        assert not bool(batch.padding_mask[b, a, 20])  # agent valid at ref


def test_actor_keep_order_ignores_placeholder_positions(rng):
    """Capacity ranking must use each actor's LAST OBSERVED position —
    positions at padded steps are zero placeholders at the scene origin,
    which ranked far-away ghosts as if they stood at the AV."""
    from trajsde_tpu.data.pack import REF_TIME, _actor_keep_order

    raw = align_to_grid(make_raw_scene(rng, 1, num_actors=4, num_lanes=6))
    raw["agent_index"] = np.int32(0)
    raw["av_index"] = np.int32(1)
    near, ghost = 2, 3
    apos = raw["positions"][0, REF_TIME].copy()
    # near: observed at the reference step, ~42 m from the agent
    raw["padding_mask"][near, : REF_TIME + 1] = False
    raw["positions"][near] = apos + 30.0
    # ghost: unobserved at ref (zero placeholder there), last seen at
    # step 10 roughly 424 m away
    raw["padding_mask"][ghost, :] = True
    raw["padding_mask"][ghost, 10] = False
    raw["positions"][ghost] = 0.0
    raw["positions"][ghost, 10] = apos + 300.0

    order = list(_actor_keep_order(raw))
    assert set(order[:2]) == {0, 1}  # agent + AV always kept first
    assert order.index(near) < order.index(ghost)
    # a never-observed actor ranks dead last
    raw["padding_mask"][ghost, :] = True
    assert list(_actor_keep_order(raw))[-1] == ghost


def test_bucketed_loader_bounded_shapes_and_truncation(rng, tmp_path):
    """A mixed-size stream packs into a bounded set of bucket shapes, and
    truncation by the capacity caps is COUNTED, not silent (VERDICT r1
    item 7)."""
    d = tmp_path / "Argoverse" / "train"
    os.makedirs(d)
    sizes = [(3, 5), (7, 12), (14, 30), (26, 60), (40, 100), (3, 6), (13, 28), (30, 90)]
    for i, (na, nl) in enumerate(sizes):
        raw = make_raw_scene(rng, 1, num_actors=na, num_lanes=nl)
        np.savez(d / f"s{i}.npz", **raw)

    ds = NuArgoDataset("train", argo_dir=str(tmp_path / "Argoverse"), nus=False)
    loader = BatchLoader(
        ds, batch_size=2, num_actors=32, num_lanes=64,
        shuffle=False, bucket=True,
    )
    shapes = {(b.x.shape[1], b.lane_positions.shape[1]) for b in loader}
    assert len(shapes) <= 3, shapes
    # caps (32, 64) truncate the (40, 100) scene — and the loss is counted
    assert all(a <= 32 and l <= 64 for a, l in shapes)
    assert loader.stats["actors_dropped"] == 8  # 40 − 32
    assert loader.stats["lanes_dropped"] == 36 + 26  # 100 − 64, 90 − 64
    assert loader.stats["scenes_truncated"] == 2
    # non-bucketed loader keeps one fixed shape
    fixed = BatchLoader(ds, batch_size=2, num_actors=32, num_lanes=64, shuffle=False)
    assert {(b.x.shape[1], b.lane_positions.shape[1]) for b in fixed} == {(32, 64)}


def test_shard_roundtrip_and_loader_equivalence(rng, tmp_path):
    """Packed shards (data/shards.py): write→read roundtrip and loader
    equality with the per-scene npz path."""
    from trajsde_tpu.data.shards import ShardFile, convert_npz_dir, write_shard

    scenes = [make_raw_scene(rng, 1, num_actors=5, num_lanes=8) for _ in range(5)]
    path = tmp_path / "x.shard"
    write_shard(str(path), scenes)
    shard = ShardFile(str(path))
    assert len(shard) == 5
    for i, want in enumerate(scenes):
        got = shard.scene(i)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))

    # npz dir → shards: the dataset yields identical batches either way
    npz_dir = tmp_path / "npz" / "Argoverse" / "train"
    shard_dir = tmp_path / "sh" / "Argoverse" / "train"
    os.makedirs(npz_dir)
    for i, s in enumerate(scenes):
        np.savez(npz_dir / f"s{i}.npz", **s)
    convert_npz_dir(str(npz_dir), str(shard_dir), scenes_per_shard=2)

    ds_npz = NuArgoDataset("train", argo_dir=str(tmp_path / "npz" / "Argoverse"), nus=False)
    ds_sh = NuArgoDataset("train", argo_dir=str(tmp_path / "sh" / "Argoverse"), nus=False)
    assert len(ds_npz) == len(ds_sh) == 5
    for i in range(5):
        a, b = ds_npz[i], ds_sh[i]
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_multiworker_loader_matches_single(rng, tmp_path):
    """num_workers > 1 must yield the SAME batches in the SAME order."""
    d = tmp_path / "Argoverse" / "train"
    os.makedirs(d)
    for i in range(12):
        raw = make_raw_scene(rng, 1, num_actors=5, num_lanes=8)
        np.savez(d / f"s{i}.npz", **raw)
    ds = NuArgoDataset("train", argo_dir=str(tmp_path / "Argoverse"), nus=False)

    def batches(workers):
        ds.epoch = 0  # shuffle is keyed by (seed, epoch); compare like epochs
        return list(
            BatchLoader(
                ds, batch_size=3, num_actors=6, num_lanes=10,
                shuffle=True, seed=7, num_workers=workers,
            )
        )

    single, multi = batches(1), batches(3)
    assert len(single) == len(multi) == 4
    for a, b in zip(single, multi):
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        np.testing.assert_array_equal(np.asarray(a.seq_id), np.asarray(b.seq_id))


def _tiny_dataset(rng, tmp_path, n=8):
    d = tmp_path / "Argoverse" / "train"
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        raw = make_raw_scene(rng, 1, num_actors=5, num_lanes=8)
        np.savez(d / f"s{i}.npz", **raw, seq_id=np.int32(i))
    return NuArgoDataset("train", argo_dir=str(tmp_path / "Argoverse"), nus=False)


def test_reshuffle_across_epochs_survives_loader_recreation(rng, tmp_path):
    """The shuffle permutation is keyed by (seed, dataset.epoch), so it
    varies across epochs even though train.py builds a FRESH BatchLoader
    per epoch — and with drop_last the excluded tail rotates instead of
    permanently starving the same scenes."""
    ds = _tiny_dataset(rng, tmp_path)

    def epoch_ids():
        loader = BatchLoader(ds, batch_size=3, num_actors=6, num_lanes=10,
                             shuffle=True, seed=0)
        return [int(s) for b in loader for s in np.asarray(b.seq_id)]

    orders, seen = [], set()
    for _ in range(4):  # fresh loader each epoch, like Trainer.fit
        ids = epoch_ids()
        assert len(ids) == 6  # drop_last: 8 → 2 batches of 3
        orders.append(tuple(ids))
        seen.update(ids)
    assert len(set(orders)) > 1, "identical shuffle every epoch"
    assert seen == set(range(8)), "drop_last starved some scenes forever"
    # deterministic: replaying the same epoch gives the same order
    epoch_now = ds.epoch
    ds.epoch = epoch_now - 1
    assert tuple(epoch_ids()) == orders[-1]


def test_loader_propagates_worker_errors(rng, tmp_path):
    """A corrupt scene must raise in the consumer — not hang the
    multi-worker iterator or silently truncate the single-worker epoch."""
    ds = _tiny_dataset(rng, tmp_path, n=4)
    (tmp_path / "Argoverse" / "train" / "s2.npz").write_bytes(b"not an npz")
    for workers in (1, 3):
        loader = BatchLoader(ds, batch_size=1, num_actors=6, num_lanes=10,
                             shuffle=False, drop_last=False,
                             num_workers=workers)
        with pytest.raises(Exception):
            list(loader)


def test_first_batch_has_no_side_effects(rng, tmp_path):
    """first_batch (the model-init template path) must not bump the
    augmentation epoch or start prefetch threads."""
    ds = _tiny_dataset(rng, tmp_path)
    loader = BatchLoader(ds, batch_size=3, num_actors=6, num_lanes=10,
                         shuffle=True, seed=0)
    before = ds.epoch
    b = loader.first_batch()
    assert b.x.shape[0] == 3 and ds.epoch == before
    # numpy leaves: the device transfer belongs to the consumption point
    assert isinstance(np.asarray(b.x), np.ndarray) and type(b.x) is np.ndarray


def test_loader_end_to_end(rng, tmp_path):
    for split in ("train", "val"):
        for name, src in (("nuScenes", 0), ("Argoverse", 1)):
            d = tmp_path / name / ("val" if split != "train" else "train")
            os.makedirs(d, exist_ok=True)
            for i in range(4):
                raw = make_raw_scene(rng, src, num_actors=6, num_lanes=8)
                np.savez(d / f"s{i}.npz", **raw)

    dm = DataModuleNuArgoMix(
        nu_dir=str(tmp_path / "nuScenes"),
        Argo_dir=str(tmp_path / "Argoverse"),
        train_batch_size=4,
        val_batch_size=4,
        num_actors=8,
        num_lanes=16,
        tr_dataset_args={"nus": True, "Argo": True, "random_flip": True},
        val_dataset_args={"nus": True, "Argo": False},
        test_dataset_args={"nus": True, "Argo": False},
    )
    train_batches = list(dm.train_loader())
    assert len(train_batches) == 2  # 8 scenes / 4
    batch = train_batches[0]
    assert batch.x.shape == (4, 8, TH, 2)
    val_batches = list(dm.val_loader())
    assert len(val_batches) == 1 and int(np.asarray(val_batches[0].source).max()) == 0


def test_shard_conversion_cli(rng, tmp_path):
    """`python -m trajsde_tpu.data.shards src dst` mirrors every split
    directory containing npz scenes into packed shards."""
    import subprocess
    import sys

    src = tmp_path / "pre"
    for sub in ("nuScenes/train", "nuScenes/val", "Argoverse/train"):
        d = src / sub
        os.makedirs(d)
        for i in range(3):
            np.savez(d / f"s{i:04d}.npz", **make_raw_scene(rng, 1))
    dst = tmp_path / "shards"
    env = dict(os.environ, TRAJSDE_FORCE_CPU="1", JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    out = subprocess.run(
        [sys.executable, "-m", "trajsde_tpu.data.shards", str(src), str(dst), "2"],
        capture_output=True, text=True, env=env, check=True,
    )
    assert "nuScenes/train: 3 scenes -> 2 shards" in out.stdout
    for sub in ("nuScenes/train", "nuScenes/val", "Argoverse/train"):
        files = sorted(os.listdir(dst / sub))
        assert files and all(f.endswith(".shard") for f in files)
    # converted tree loads identically to the npz tree
    a = NuArgoDataset("train", argo_dir=str(src / "Argoverse"), nus=False)
    b = NuArgoDataset("train", argo_dir=str(dst / "Argoverse"), nus=False)
    for i in range(len(a)):
        for k in a[i]:
            np.testing.assert_array_equal(np.asarray(a[i][k]), np.asarray(b[i][k]))


def test_shard_conversion_guards(rng, tmp_path):
    """convert_npz_dir refuses in-place conversion and non-empty dst dirs
    (stale shards would silently duplicate scenes under list_shards)."""
    from trajsde_tpu.data.shards import convert_npz_dir

    d = tmp_path / "train"
    os.makedirs(d)
    for i in range(4):
        np.savez(d / f"s{i}.npz", **make_raw_scene(rng, 1))
    with pytest.raises(ValueError, match="dst_dir == src_dir"):
        convert_npz_dir(str(d), str(d))
    dst = tmp_path / "sh"
    convert_npz_dir(str(d), str(dst), scenes_per_shard=2)
    with pytest.raises(ValueError, match="already holds"):
        convert_npz_dir(str(d), str(dst), scenes_per_shard=4)
