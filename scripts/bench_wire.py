"""A/B the host→device transfer cost: per-field batch vs wire format.

Isolates the lever behind ``--wire`` (``data/wire.py``): on this
environment's relayed TPU backend each pytree leaf of a ``device_put``
is its own transfer RPC, so a ~15-leaf production ``SceneBatch`` pays
~15 round trips per batch where the 3-buffer wire format pays 3 (plus a
host-side memcpy pass to pack).  PERF.md round 4 ("Wire-format transfer
packing") measured the residual e2e overhead at ~21 ms/step over the
167 ms device step after ``strip_for_device`` (63 ms was the pre-strip
figure) — this script attributes it.  Verdict on this relayed host:
NEGATIVE (the relay pipelines per-leaf puts; the pack pass costs host
CPU) — see PERF.md before re-opening this campaign.

Timing rule (CLAUDE.md): ``block_until_ready`` through the relay can
return early, so each transfer is closed by a jitted all-leaf reduction
whose scalar is fetched back — that forces the bytes to be resident.
The reduction executable is compiled once per format before timing.

    python scripts/bench_wire.py          # on the tunneled TPU
    TRAJSDE_BENCH_TINY=1 python scripts/bench_wire.py   # smoke shapes
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.data.scene import strip_for_device
from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.data.wire import pack_wire

TINY = bool(os.environ.get("TRAJSDE_BENCH_TINY"))
B, A, L = (8, 6, 8) if TINY else (128, 48, 192)
REPS = 3 if TINY else 12


def main() -> None:
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(0)
    batch = strip_for_device(
        jax.tree.map(
            np.asarray,
            make_scene_batch(
                rng, batch_size=B, num_actors=A, num_lanes=L, sources=[0, 1]
            ),
        )
    )
    n_leaves = len(jax.tree.leaves(batch))
    total_mib = sum(x.nbytes for x in jax.tree.leaves(batch)) / 2**20
    wire = pack_wire(batch)
    print(
        f"batch B={B} A={A} L={L}: {n_leaves} leaves, {total_mib:.1f} MiB; "
        f"wire: {len(jax.tree.leaves(wire))} buffers"
    )

    @jax.jit
    def land(tree):
        # touching every leaf forces the transfer to be complete before
        # the scalar comes back
        return sum(jnp.sum(jnp.asarray(x, jnp.float32)[..., :1]) for x in jax.tree.leaves(tree))

    MIB = 2**20
    wire_part = pack_wire(batch, inline_min_bytes=MIB)
    print(
        f"wire(inline>=1MiB): {len(jax.tree.leaves(wire_part))} transfers "
        f"({len(wire_part.inline)} inline + {len(wire_part.bufs)} packed)"
    )

    # compile the executables outside the timed region
    float(land(jax.device_put(batch)))
    float(land(jax.device_put(wire)))
    float(land(jax.device_put(wire_part)))

    def run(make_item, label):
        t_pack = 0.0
        t0 = time.perf_counter()
        for _ in range(REPS):
            p0 = time.perf_counter()
            item = make_item()
            t_pack += time.perf_counter() - p0
            float(land(jax.device_put(item)))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(
            f"{label}: {dt:.1f} ms/batch end-to-end "
            f"(host prep {t_pack / REPS * 1000:.1f} ms)"
        )
        return dt

    per_field = run(lambda: batch, "per-field (current default)")
    wired = run(lambda: pack_wire(batch), "wire (pack + 3 transfers)")
    part = run(
        lambda: pack_wire(batch, inline_min_bytes=MIB),
        "wire inline>=1MiB (big fields native, small tail packed)",
    )
    print(f"wire speedup: {per_field / wired:.2f}x  "
          f"inline-variant speedup: {per_field / part:.2f}x")


if __name__ == "__main__":
    main()
