"""Golden-value regression: fixed seed → fixed forward statistics.

Locks the end-to-end semantics across refactors/rounds: any change to the
math (masks, rotations, scan order, eos gathering, head shapes) shifts
these statistics.  Values were recorded on CPU/f32 with the committed
seeds; tolerances allow only platform-level numeric noise.

To intentionally re-baseline after a deliberate semantic change:
    pytest tests/test_golden.py --regen  (via TRAJSDE_REGEN_GOLDEN=1)
"""
import json
import os

import jax
import numpy as np

from trajsde_tpu.data.synthetic import make_scene_batch

from tests.test_models_forward import make_baseline, make_sde

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "forward_stats.json")


def _stats(model, sde: bool):
    scene = make_scene_batch(
        np.random.default_rng(1234), batch_size=2, num_actors=8, num_lanes=12,
        sources=[0, 1],
    )
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    params = jax.jit(model.init)(rngs, scene)
    out = jax.jit(lambda p, s, k: model.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    stats = {
        "loc_mean": float(np.asarray(out["loc"][..., :2]).mean()),
        "loc_std": float(np.asarray(out["loc"][..., :2]).std()),
        "pi_mean": float(np.asarray(out["pi"]).mean()),
        "y_mean": float(np.asarray(out["y"]).mean()),
    }
    if sde:
        stats["diff_in_mean"] = float(np.asarray(out["diff_in"]).mean())
        stats["diff_out_mean"] = float(np.asarray(out["diff_out"]).mean())
    return stats


def test_golden_forward_statistics():
    got = {
        "baseline": _stats(make_baseline(), sde=False),
        "sde": _stats(make_sde(), sde=True),
    }
    if os.environ.get("TRAJSDE_REGEN_GOLDEN") or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=2)
        if not os.environ.get("TRAJSDE_REGEN_GOLDEN"):
            raise AssertionError(
                "golden file was missing — generated; commit it and re-run"
            )
        return
    want = json.load(open(GOLDEN_PATH))
    for family, stats in want.items():
        for key, value in stats.items():
            np.testing.assert_allclose(
                got[family][key], value, rtol=2e-3, atol=1e-4,
                err_msg=f"{family}/{key} drifted — semantic change?",
            )
