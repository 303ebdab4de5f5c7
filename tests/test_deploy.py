"""Deployment artifacts: export → load → serve parity, schema guards."""
from __future__ import annotations

import json
import os

import jax
import numpy as np
import pytest

from trajsde_tpu.data.grid import align_to_grid
from trajsde_tpu.data.pack import pack_scenes
from trajsde_tpu.data.synthetic import make_raw_scene, make_scene_batch
from trajsde_tpu.deploy import export_serving, load_serving
from trajsde_tpu.server import ServingEngine

from test_models_forward import make_sde

A, L = 8, 12


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    rng = np.random.default_rng(0)
    model = make_sde()
    scene = make_scene_batch(rng, batch_size=1, num_actors=A, num_lanes=L)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )["params"]
    raw = make_raw_scene(rng, 0, num_actors=5, num_lanes=6)
    example = pack_scenes([align_to_grid(dict(raw, source=0))], A, L)
    out_dir = str(tmp_path_factory.mktemp("artifact"))
    manifest = export_serving(
        model, params, example, out_dir, buckets=(1, 2), ref_time=20
    )
    return model, params, out_dir, manifest


def test_manifest_and_files(exported):
    _, _, out_dir, manifest = exported
    assert manifest["buckets"] == [1, 2]
    assert manifest["num_actors"] == A and manifest["num_lanes"] == L
    assert os.path.exists(os.path.join(out_dir, "bucket_1.shlo"))
    assert os.path.exists(os.path.join(out_dir, "bucket_2.shlo"))
    on_disk = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert on_disk == manifest


def test_exported_engine_matches_scan_engine(exported, rng):
    """ServingEngine.from_export must reproduce the scan engine exactly:
    same artifacts of the same weights, same key counter → same draws."""
    model, params, out_dir, _ = exported
    scenes = [make_raw_scene(rng, s % 2, num_actors=5, num_lanes=6)
              for s in range(3)]

    ref = ServingEngine(model, params, num_actors=A, num_lanes=L,
                        engine="scan", batch_buckets=(1, 2), seed=5)
    ref_out = ref.predict(scenes)
    ref.close()

    eng = ServingEngine.from_export(out_dir, seed=5)
    assert eng.buckets == (1, 2) and eng.max_batch == 2
    got = eng.predict(scenes)
    eng.close()

    for a, b in zip(ref_out, got):
        np.testing.assert_allclose(b["loc"], a["loc"], atol=1e-5)
        np.testing.assert_allclose(b["agent_world"], a["agent_world"], atol=1e-4)
        np.testing.assert_allclose(b["agent_pi"], a["agent_pi"], atol=1e-5)


def test_schema_guards(exported, rng):
    _, _, out_dir, _ = exported
    exp = load_serving(out_dir)
    key = jax.random.key(0)

    raw = make_raw_scene(rng, 0, num_actors=5, num_lanes=6)
    big = pack_scenes([align_to_grid(dict(raw, source=0))] * 4, A, L)
    with pytest.raises(ValueError, match="no exported bucket"):
        exp(big, key)

    wrong_dims = pack_scenes([align_to_grid(dict(raw, source=0))], A + 2, L)
    with pytest.raises(ValueError, match="num_actors"):
        exp(wrong_dims, key)


def test_bad_manifest_rejected(tmp_path):
    os.makedirs(tmp_path / "x", exist_ok=True)
    (tmp_path / "x" / "manifest.json").write_text('{"format": "other"}')
    with pytest.raises(ValueError, match="not a serving export"):
        load_serving(str(tmp_path / "x"))


def test_stale_delta_mode_artifact_refused(exported, tmp_path):
    """A delta-mode artifact baked before postprocess rev 2 lacks the
    cumsum + grid-scale math in agent_world — loading must fail loudly
    instead of serving silently-wrong world coordinates."""
    _, _, out_dir, manifest = exported
    stale = tmp_path / "stale"
    os.makedirs(stale, exist_ok=True)
    m = dict(manifest, is_gtabs=False)
    m.pop("postprocess_rev")  # pre-rev-2 manifests had no such field
    (stale / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(ValueError, match="postprocess rev 1"):
        load_serving(str(stale))
    # gtabs artifacts from the same era are unaffected by the fix
    m2 = dict(manifest)
    m2.pop("postprocess_rev")
    (stale / "manifest.json").write_text(json.dumps(m2))
    for b in m2["buckets"]:
        data = open(os.path.join(out_dir, f"bucket_{b}.shlo"), "rb").read()
        (stale / f"bucket_{b}.shlo").write_bytes(data)
    load_serving(str(stale))
