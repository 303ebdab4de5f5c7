"""Loss/metric semantics vs independent numpy oracles of the reference math."""
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.losses import diff_bce_loss, l2_loss, laplace_nll_loss
from trajsde_tpu.train.metrics import ade_t_update, fde_t_update, mr_t_update


def _setup(rng, B=3, F=4, A=5, T=6):
    loc = rng.normal(size=(B, F, A, T, 2)).astype(np.float32)
    y = rng.normal(size=(B, A, T, 2)).astype(np.float32)
    mask = rng.uniform(size=(B, A, T)) > 0.3
    mask[0, 0] = False  # one fully-invalid actor
    return loc, y, mask


def test_l2_loss_oracle(rng):
    loc, y, mask = _setup(rng)
    out = {"loc": jnp.asarray(loc), "reg_mask": jnp.asarray(mask)}
    got = float(l2_loss(jnp.asarray(y), out))

    # oracle: reference semantics (losses/L2.py) per (scene, actor)
    l2 = np.linalg.norm(y[:, None] - loc, axis=-1)       # [B, F, A, T]
    ade = (l2 * mask[:, None]).sum(-1)                   # argmin rule
    best = ade.argmin(1)                                 # [B, A]
    num = den = 0.0
    B, F, A, T = l2.shape
    for b in range(B):
        for a in range(A):
            m = mask[b, a]
            num += l2[b, best[b, a], a][m].sum()
            den += m.sum()
    assert abs(got - num / den) < 1e-5


def test_l2_loss_empty_mask_is_zero(rng):
    loc, y, mask = _setup(rng)
    out = {"loc": jnp.asarray(loc), "reg_mask": jnp.zeros_like(jnp.asarray(mask))}
    assert float(l2_loss(jnp.asarray(y), out)) == 0.0


def test_diff_bce_loss(rng):
    p_in = np.array([0.1, 0.2], np.float32)
    p_out = np.array([0.8, 0.9], np.float32)
    out = {
        "diff_in": jnp.asarray(p_in),
        "diff_out": jnp.asarray(p_out),
        "label_in": jnp.zeros(2),
        "label_out": jnp.ones(2),
    }
    got = float(diff_bce_loss(None, out))
    want = float((-np.log(1 - p_in)).mean() + (-np.log(p_out)).mean())
    assert abs(got - want) < 1e-5


def test_laplace_nll_finite(rng):
    loc, y, mask = _setup(rng)
    scale = np.abs(rng.normal(size=loc.shape)).astype(np.float32) + 0.5
    out = {
        "loc": jnp.concatenate([jnp.asarray(loc), jnp.asarray(scale)], -1),
        "reg_mask": jnp.asarray(mask),
    }
    assert np.isfinite(float(laplace_nll_loss(jnp.asarray(y), out)))


def _metric_inputs(rng, B=6, K=4, T=60):
    pred = rng.normal(size=(B, K, T, 2)).astype(np.float32)
    target = rng.normal(size=(B, T, 2)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[0] = False          # scene with no valid future
    mask[1, 30:] = False     # Argoverse-like truncated future
    source = np.array([0, 1, 0, 1, 0, 1], np.int32)
    return pred, target, mask, source


def test_ade_t_nuscenes_rule(rng):
    pred, target, mask, source = _metric_inputs(rng)
    s, c = ade_t_update(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(source), dataset="nuScenes", end_idcs=(59, 29),
    )
    # oracle
    l2 = np.linalg.norm(pred - target[:, None], axis=-1) * mask[:, None]
    want_sum, want_cnt = 0.0, 0
    for b in range(len(pred)):
        if not mask[b].any():
            continue
        ade = l2[b].sum(-1) / mask[b].sum()
        want_sum += ade.min()
        want_cnt += 1
    assert abs(float(s) - want_sum) < 1e-4 and int(c) == want_cnt


def test_fde_t_per_source_end_index(rng):
    pred, target, mask, source = _metric_inputs(rng)
    s, c = fde_t_update(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
        jnp.asarray(source), dataset="nuScenes", end_idcs=(59, 29),
    )
    want_sum, want_cnt = 0.0, 0
    for b in range(len(pred)):
        e = [59, 29][source[b]]
        if not mask[b, e]:
            continue
        l2 = np.linalg.norm(pred[b, :, e] - target[b, e], axis=-1)
        want_sum += l2.min()
        want_cnt += 1
    assert abs(float(s) - want_sum) < 1e-4 and int(c) == want_cnt


def test_mr_t_rules(rng):
    pred, target, mask, source = _metric_inputs(rng)
    for dataset in ("nuScenes", "Argoverse"):
        s, c = mr_t_update(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
            jnp.asarray(source), dataset=dataset, end_idcs=(59, 29),
        )
        assert 0 <= float(s) <= float(c)


def test_per_source_metric_breakdown(rng):
    """Per-domain variants partition the aggregate exactly."""
    from trajsde_tpu.train.metrics import make_metrics

    pred, target, mask, source = _metric_inputs(rng)
    metrics = make_metrics(
        ["ADE_T"],
        [{"dataset": "nuScenes", "end_idcs": [59, 29], "sources": [0, 1],
          "per_source": True}],
    )
    assert [m.name for m in metrics] == ["ADE_T", "ADE_T_src0", "ADE_T_src1"]
    sums, counts = {}, {}
    for m in metrics:
        s, c = m.update_fn(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
            jnp.asarray(source),
        )
        sums[m.name], counts[m.name] = float(s), int(c)
    assert counts["ADE_T"] == counts["ADE_T_src0"] + counts["ADE_T_src1"]
    np.testing.assert_allclose(
        sums["ADE_T"], sums["ADE_T_src0"] + sums["ADE_T_src1"], rtol=1e-5
    )
