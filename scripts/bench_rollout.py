"""TPU bench: decoder SDE rollout engines (serving hot loop).

20480 rows × 60 Euler–Maruyama steps of the decoder latent SDE
(``dec_hivt_nusargo_sde.py:72,88``).  Engines:

* ``scan``      — XLA ``lax.scan`` with ``jax.random.normal`` increments
                  (the training path's formulation)
* ``gaussian``  — Pallas kernel, on-core pair-output Box–Muller
* ``rademacher``— Pallas kernel, two-point ±1 increments (serving default)

Honest protocol (CLAUDE.md): ITERS rollouts chained on-device inside one
jitted fori_loop, timing closed by a value fetch.  Also prints terminal
mean/std per engine so distribution drift is visible.

    python scripts/bench_rollout.py [--rows 20480] [--iters 20]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.set_cache_dir("/tmp/jax_cache_trajsde")
except Exception:
    pass


def make_params(key, D=64):
    ks = jax.random.split(key, 8)
    x = lambda k, s: jax.random.normal(k, s) * 0.2
    return dict(
        wf0=x(ks[0], (D, D)), wf0t=x(ks[1], (2, D)), bf0=jnp.zeros((1, D)),
        wf1=x(ks[2], (D, D)), bf1=jnp.zeros((1, D)),
        wf2=x(ks[3], (D, D)), bf2=jnp.zeros((1, D)),
        wg0=x(ks[4], (D, D)), wg0t=x(ks[5], (2, D)), bg0=jnp.zeros((1, D)),
        wg1=x(ks[6], (D, D)), bg1=jnp.zeros((1, D)),
        wgo=x(ks[7], (D, 1)), bgo=jnp.zeros((1, 1)),
    )


def scan_rollout(y0, p, t0s, dts, key, num_steps):
    """Reference XLA formulation: identical math, PRNG normals per step."""

    def step(y, inp):
        i, t, dt = inp
        s, c = jnp.sin(t), jnp.cos(t)
        h = jnp.tanh(y @ p["wf0"] + s * p["wf0t"][0] + c * p["wf0t"][1] + p["bf0"][0])
        h = jnp.tanh(h @ p["wf1"] + p["bf1"][0])
        f = h @ p["wf2"] + p["bf2"][0]
        hg = jnp.tanh(y @ p["wg0"] + s * p["wg0t"][0] + c * p["wg0t"][1] + p["bg0"][0])
        hg = jnp.tanh(hg @ p["wg1"] + p["bg1"][0])
        g = jax.nn.sigmoid(hg @ p["wgo"] + p["bgo"][0])
        z = jax.random.normal(jax.random.fold_in(key, i), y.shape, y.dtype)
        y1 = y + f * dt + g * (jnp.sqrt(dt) * z)
        return y1, y1

    _, ys = jax.lax.scan(step, y0, (jnp.arange(num_steps), t0s, dts))
    return ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20480)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--block-rows", type=int, default=1024)
    ap.add_argument("--unroll", type=int, default=10)
    args = ap.parse_args()

    from trajsde_tpu.ops.pallas.sde_rollout import sde_rollout

    D = 64
    p = make_params(jax.random.key(0), D)
    y0 = jax.random.normal(jax.random.key(1), (args.rows, D)) * 0.5
    ts = jnp.linspace(0.0, 3.0, args.steps + 1)
    t0s, dts = ts[:-1], ts[1:] - ts[:-1]
    y0, p = jax.device_put(y0), jax.device_put(p)

    def timed(name, fn):
        @jax.jit
        def loop(y0):
            def body(i, acc):
                out = fn(y0, jnp.int32(1234) + i)
                return acc + out[-1].mean() + jnp.abs(out[-1]).mean()

            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        v = float(loop(y0))  # compile + warm
        t0 = time.perf_counter()
        v = float(loop(y0))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        out = fn(y0, jnp.int32(7))
        term = np.asarray(out[-1])
        print(
            f"{name:28s}: {dt / args.iters * 1000:6.2f} ms/rollout   "
            f"terminal mean={term.mean():+.4f} std={term.std():.4f}",
            flush=True,
        )

    timed(
        "xla scan gaussian",
        lambda y, s: scan_rollout(y, p, t0s, dts, jax.random.key(11), args.steps),
    )
    for inc in ("gaussian", "rademacher"):
        timed(
            f"pallas {inc} u{args.unroll}",
            lambda y, s, inc=inc: sde_rollout(
                y, p, t0s, dts, s, num_steps=args.steps,
                block_rows=args.block_rows, unroll=args.unroll, increments=inc,
            ),
        )


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    print("devices:", jax.devices(), flush=True)
    main()
