"""Deployment artifacts: the serving pipeline serialized as StableHLO.

The reference has no deployment story at all (its eval surface is
``trainer.test``, ``/root/reference/test.py:58``; serving a trained model
requires the full torch + PyG + torchsde stack).  The TPU-native answer
is :mod:`jax.export`: the COMPLETE serving computation — scan-engine
forward plus the world-frame focal-agent postprocess
(:func:`trajsde_tpu.server.make_postprocess`), with the trained weights
baked in as constants — is lowered to StableHLO once per batch bucket and
serialized.  A deployment host then needs only jax + this loader: no
config, no checkpoint, no flax tracing, no model code, and the artifact
is insulated from model-code drift (the compiled graph IS the model).

Artifact layout (one directory)::

    manifest.json      buckets, packing dims, leaf schema, platforms, ...
    bucket_<B>.shlo    serialized ``jax.export.Exported`` per batch bucket

Validated cross-platform: a ``platforms=["cpu", "tpu"]`` artifact
exported from a CPU-only process executes on a real TPU v5e chip and
matches the CPU predictions to <1% (f32 matmul-accumulation numerics
over the 60-step SDE rollout; the threefry noise bits are
platform-identical).

Calling convention: the ``SceneBatch`` pytree is passed as its flattened
leaves (the treedef is closed over at export time; the loader re-packs
scenes with the same packer, so flatten order matches by construction and
the manifest's leaf schema is validated on every call).  PRNG keys cross
the boundary as raw ``key_data`` so the artifact does not depend on the
typed-key extended dtype.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

MANIFEST = "manifest.json"
# Baked-postprocess revision. Bump when make_postprocess changes math so
# stale artifacts fail loudly instead of serving silently-wrong outputs.
# rev 2: delta-mode cumsum + nuScenes grid-scale undo in agent_world.
POSTPROCESS_REV = 2


def _leaf_schema(leaves: Sequence[Any]) -> List[Dict[str, Any]]:
    return [
        {"shape": list(np.shape(l)), "dtype": str(np.asarray(l).dtype)}
        for l in leaves
    ]


def export_serving(
    model,
    params: Dict[str, Any],
    example_scene,
    out_dir: str,
    *,
    buckets: Sequence[int] = (1, 8, 32, 128),
    is_gtabs: bool = True,
    ref_time: int = 20,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Serialize the serving pipeline for every batch bucket.

    ``example_scene`` is a packed B=1 :class:`SceneBatch` fixing the leaf
    schema (actor/lane padding, optional-field presence); each bucket's
    input spec tiles its leading batch dimension.  ``platforms`` (e.g.
    ``["cpu", "tpu"]``) emits a multi-platform module; default is the
    exporting backend.  Returns the manifest dict.
    """
    from jax import export as jax_export

    from trajsde_tpu.server import make_postprocess

    leaves, treedef = jax.tree.flatten(example_scene)
    post = make_postprocess(is_gtabs, ref_time)
    key_data = jax.random.key_data(jax.random.key(0))
    key_spec = jax.ShapeDtypeStruct(key_data.shape, key_data.dtype)

    def pipeline(scene_leaves, key_data):
        scene = jax.tree.unflatten(treedef, scene_leaves)
        key = jax.random.wrap_key_data(key_data)
        out = model.apply({"params": params}, scene, rngs={"sde": key})
        return post(scene, out)

    os.makedirs(out_dir, exist_ok=True)
    buckets = sorted(set(int(b) for b in buckets))
    kw = {"platforms": list(platforms)} if platforms else {}
    for b in buckets:
        specs = [
            jax.ShapeDtypeStruct((b,) + tuple(np.shape(l)[1:]),
                                 np.asarray(l).dtype)
            for l in leaves
        ]
        exp = jax_export.export(jax.jit(pipeline), **kw)(specs, key_spec)
        with open(os.path.join(out_dir, f"bucket_{b}.shlo"), "wb") as f:
            f.write(exp.serialize())

    manifest = {
        "format": "trajsde_tpu.serving_export.v1",
        "buckets": buckets,
        "num_actors": int(example_scene.num_actors),
        "num_lanes": int(example_scene.num_lanes),
        "is_gtabs": bool(is_gtabs),
        "ref_time": int(ref_time),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "leaf_schema": _leaf_schema(leaves),
        "key_data": {"shape": list(key_spec.shape), "dtype": str(key_spec.dtype)},
        "postprocess_rev": POSTPROCESS_REV,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedServing:
    """A loaded artifact: callable ``(scene, key) -> post dict`` per bucket.

    Drop-in for :class:`trajsde_tpu.server.ServingEngine`'s serve slot
    (``engine="exported"`` / ``ServingEngine.from_export``).
    """

    def __init__(self, path: str) -> None:
        from jax import export as jax_export

        with open(os.path.join(path, MANIFEST)) as f:
            m = json.load(f)
        if m.get("format") != "trajsde_tpu.serving_export.v1":
            raise ValueError(f"{path}: not a serving export (got {m.get('format')!r})")
        self.path = path
        self.buckets = tuple(m["buckets"])
        self.num_actors = int(m["num_actors"])
        self.num_lanes = int(m["num_lanes"])
        self.is_gtabs = bool(m["is_gtabs"])
        # delta-mode artifacts baked before postprocess rev 2 are missing
        # the cumsum/grid-scale math in agent_world — refuse to serve them
        if not self.is_gtabs and m.get("postprocess_rev", 1) < POSTPROCESS_REV:
            raise ValueError(
                f"{path}: delta-mode (is_gtabs=false) artifact was exported "
                f"with postprocess rev {m.get('postprocess_rev', 1)} < "
                f"{POSTPROCESS_REV}; its baked world projection predates the "
                "delta-mode cumsum/grid-scale fix — re-export from the "
                "checkpoint"
            )
        self.ref_time = int(m["ref_time"])
        self.platforms = tuple(m["platforms"])
        self.leaf_schema = m["leaf_schema"]
        self.manifest = m
        self._fns = {}
        for b in self.buckets:
            with open(os.path.join(path, f"bucket_{b}.shlo"), "rb") as f:
                self._fns[b] = jax_export.deserialize(f.read())

    def __call__(self, scene, key) -> Dict[str, Any]:
        """``key`` is either a typed PRNG key or raw ``key_data`` (uint32)
        — the serving engine derives key material host-side so the hot
        path dispatches no eager key ops."""
        leaves = jax.tree.leaves(scene)
        b = int(np.shape(leaves[0])[0])
        if b not in self._fns:
            raise ValueError(
                f"batch size {b} has no exported bucket (have {self.buckets})"
            )
        if len(leaves) != len(self.leaf_schema):
            raise ValueError(
                f"scene has {len(leaves)} leaves but the artifact was exported "
                f"with {len(self.leaf_schema)} — optional SceneBatch fields "
                "must match the export-time example (check y/lane/goal/seq_id "
                "presence and the packer dims in manifest.json)"
            )
        for l, s in zip(leaves, self.leaf_schema):
            if list(np.shape(l))[1:] != s["shape"][1:]:
                raise ValueError(
                    f"leaf shape {np.shape(l)} != exported {tuple(s['shape'])} "
                    "(batch dim aside) — repack with the manifest's "
                    f"num_actors={self.num_actors}/num_lanes={self.num_lanes}"
                )
            if np.asarray(l).dtype != np.dtype(s["dtype"]):
                raise ValueError(
                    f"leaf dtype {np.asarray(l).dtype} != exported "
                    f"{s['dtype']} — repack with the manifest schema (plain "
                    "python floats default to float64; cast before calling)"
                )
        kd = key
        if jax.dtypes.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key):
            kd = jax.random.key_data(key)
        return self._fns[b].call(leaves, kd)


def load_serving(path: str) -> ExportedServing:
    return ExportedServing(path)
