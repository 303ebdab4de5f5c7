"""Evaluation CLI (reference analog: ``test.py:12-58``).

    python test.py -c configs/nusargo/sde.yml --ckpt PATH [--ood]

Runs the test split, computes the transfer metrics, and writes
``result_<ckpt>.json`` next to the checkpoint (``model_base_mix.py:152-167``).
``--ood`` routes the SDE encoder through its OOD ensemble scoring and
additionally reports the mean per-agent embedding std.
"""
from __future__ import annotations

import argparse
import json
import os

import jax

if os.environ.get("TRAJSDE_FORCE_CPU"):
    # tests force CPU; the ambient sitecustomize pins the axon TPU via
    # jax.config, which outranks JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
try:
    from jax.experimental.compilation_cache import compilation_cache as _cc

    from trajsde_tpu.utils.cache import cpu_cache_dir

    # CPU cache dir is ISA-keyed (utils/cache.py): stale cross-boot
    # XLA:CPU artifacts SIGILL / flake when deserialized
    _cc.set_cache_dir(
        cpu_cache_dir()
        if os.environ.get("TRAJSDE_FORCE_CPU")
        else "/tmp/jax_cache_trajsde"
    )
except Exception:
    pass
import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--ood", action="store_true")
    parser.add_argument(
        "--submit",
        action="store_true",
        help="dump per-scene agent predictions (world frame) for submission",
    )
    parser.add_argument(
        "--viz-ood",
        action="store_true",
        help="with --ood: save per-batch OOD-score scene renderings",
    )
    parser.add_argument("--viz-limit", type=int, default=8)
    parser.add_argument("--num-actors", type=int, default=None,
                        help="actor capacity (overrides config; default: "
                        "config value or 48)")
    parser.add_argument("--num-lanes", type=int, default=None,
                        help="lane capacity (overrides config; default: "
                        "config value or 192)")
    parser.add_argument(
        "--only-agent",
        action="store_true",
        help="filter each batch to the focal agents before metric update "
        "(reference `only_agent`, model_base_mix.py:133-137)",
    )
    parser.add_argument(
        "--serving",
        action="store_true",
        help="run inference through the fused Pallas rollout engine "
        "(VMEM-resident 60-step decoder; Rademacher increments by default)",
    )
    parser.add_argument(
        "--serving-increments", choices=["rademacher", "gaussian"],
        default="rademacher",
    )
    parser.add_argument(
        "--wire",
        action="store_true",
        help="pack each batch to one host->device buffer per dtype before "
        "the transfer (exact in-trace relayout; cuts per-leaf transfer "
        "round trips on relayed/remote TPU backends)",
    )
    args = parser.parse_args()

    from trajsde_tpu.config import build_model, load_config
    from trajsde_tpu.data.loader import DataModuleNuArgoMix
    from trajsde_tpu.data.scene import strip_for_device
    from trajsde_tpu.parallel import mesh as mesh_lib
    from trajsde_tpu.train.checkpoint import CheckpointManager
    from trajsde_tpu.train.loop import agent_slices, create_train_state, gather_agent
    from trajsde_tpu.train.metrics import make_metrics
    import optax

    cfg = load_config(args.config)
    dm_kwargs = dict(cfg.datamodule)
    # explicit CLI flags override the config (conventional precedence)
    if args.num_actors is not None:
        dm_kwargs["num_actors"] = args.num_actors
    if args.num_lanes is not None:
        dm_kwargs["num_lanes"] = args.num_lanes
    datamodule = DataModuleNuArgoMix(**dm_kwargs)

    model = build_model(cfg)
    metrics = make_metrics(
        [n for n, _ in cfg.metric_specs], [dict(a) for _, a in cfg.metric_specs]
    )

    mesh = mesh_lib.make_mesh_for_batch(datamodule.val_batch_size)
    loader = datamodule.test_loader()
    example = mesh_lib.shard_batch(strip_for_device(loader.first_batch()), mesh)
    state = create_train_state(model, optax.identity(), example)
    ckpt_dir = os.path.dirname(os.path.abspath(args.ckpt))
    # weights-only restore: the eval state's optimizer tree differs from
    # whatever optimizer trained the checkpoint
    params = CheckpointManager(ckpt_dir).restore_params(state.params, args.ckpt)
    state = state.replace(params=params)

    ood = args.ood
    # the reference carries only_agent as a MODEL kwarg
    # (model_base_mix.py:133-137); honor the config value so a reference
    # YAML with `only_agent: true` drops in unchanged (CLI flag also works)
    only_agent = args.only_agent or bool(cfg.model_kwargs.get("only_agent", False))
    # delta-target mode: metrics must be computed on cumsummed (absolute)
    # trajectories (``model_base_mix.py:143-145``)
    is_gtabs = (cfg.datamodule.get("test_dataset_args") or {}).get("is_gtabs", True)

    post_fn = None
    if args.submit:
        from trajsde_tpu.server import make_postprocess

        post_fn = make_postprocess(is_gtabs, cfg.model_kwargs.get("ref_time", 20))

    serve = None
    if args.serving:
        from trajsde_tpu.serving import make_serving_fn

        if "sde_rollout" not in state.params.get("decoder", {}):
            raise SystemExit(
                "--serving requires the SDE decoder (the fused rollout "
                "engine); this config's decoder has no rollout"
            )
        # --serving --ood composes: the encoder routes through its OOD
        # ensemble (stds attached, predictions decode from the ensemble
        # mean) while the decoder rollout stays on the fused kernel
        serve = make_serving_fn(
            model, {"params": state.params},
            interpret=jax.default_backend() != "tpu",
            increments=args.serving_increments,
            ood=ood,
        )
        dec = model.decoder
        Tf, K, D = dec.future_steps, dec.num_modes, dec.local_channels

    @jax.jit
    def eval_step(params, scene, key, batch_idx):
        from trajsde_tpu.data.wire import unpack_if_wire

        scene = unpack_if_wire(scene)  # --wire relayout, in-trace
        # fold_in INSIDE the trace — an eager per-batch fold_in is one
        # device round trip per batch on the remote TPU backend
        key = jax.random.fold_in(key, batch_idx)
        if serve is not None:
            import jax.numpy as jnp

            seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
            noise = None
            if jax.default_backend() != "tpu":
                # the CPU interpreter lacks the on-core PRNG primitives
                B, A = scene.x.shape[0], scene.x.shape[1]
                noise = jax.random.normal(
                    jax.random.fold_in(key, 1), (Tf, B * K * A, D), jnp.float32
                )
            out = serve(scene, key, seed, noise)
        else:
            kwargs = {"ood": True} if ood else {}
            out = model.apply({"params": params}, scene, rngs={"sde": key}, **kwargs)
        # full-actor diffusion stds for --viz-ood, captured BEFORE any
        # only_agent filtering: the viz consumer indexes them with the
        # UNFILTERED scene's actor mask
        stds_full = out.get("stds")
        if only_agent:
            from trajsde_tpu.data.transforms import (
                leave_only_agent,
                leave_only_agent_output,
            )

            if "stds" in out:
                from trajsde_tpu.data.transforms import take_per_scene

                out["stds"] = take_per_scene(
                    out["stds"], scene.agent_index, axis=1
                )
            out = leave_only_agent_output(out, scene.agent_index)
            scene = leave_only_agent(scene)
        result = {}
        if out.get("y") is not None:
            pred, target, reg_mask, source = agent_slices(scene, out, is_gtabs)
            for m in metrics:
                result[m.name] = m.update_fn(pred, target, reg_mask, source)
        if "stds" in out:
            agent_std = gather_agent(out["stds"], scene.agent_index, axis=1)
            result["agent_std"] = (agent_std.sum(), agent_std.shape[0])
            result["stds_full"] = stds_full
        if args.submit:
            # world-frame focal-agent projection — the SAME jitted math the
            # serving engine ships (``server.py:make_postprocess``), incl.
            # the delta-mode cumsum + nuScenes grid-scale undo
            import jax.numpy as jnp

            post = post_fn(scene, out)
            seq = scene.seq_id if scene.seq_id is not None else jnp.zeros(
                (post["agent_world"].shape[0],), jnp.int32
            )
            result["submission"] = (
                post["agent_world"], post["agent_pi"], seq, scene.source
            )
        return result

    key = jax.random.key(0)
    std_sum, std_cnt = 0.0, 0
    submissions = []
    for i, host_scene in enumerate(loader):
        # device copy sheds goal one-hots / future positions (exact —
        # no jitted consumer reads them); viz below keeps the full
        # host-side batch (viz_scene draws the future ground truth)
        scene = strip_for_device(host_scene)
        if args.wire:
            from trajsde_tpu.data.wire import pack_wire

            scene = pack_wire(scene)
        scene = mesh_lib.shard_batch(scene, mesh)
        contribs = eval_step(state.params, scene, key, np.int32(i))
        for m in metrics:
            if m.name in contribs:
                m.accumulate(contribs[m.name])
        if "agent_std" in contribs:
            s, c = contribs["agent_std"]
            std_sum += float(s)
            std_cnt += int(c)
        if args.viz_ood and "stds_full" in contribs and i < args.viz_limit:
            from trajsde_tpu.utils.viz import viz_ood as _viz_ood

            viz_dir = os.path.join(os.path.dirname(ckpt_dir), "out", "viz_ood")
            _viz_ood(host_scene, np.asarray(contribs["stds_full"]), 0,
                     os.path.join(viz_dir, f"batch{i:04d}.png"))
        if "submission" in contribs:
            world, probs, seq, src = contribs["submission"]
            submissions.append(
                (np.asarray(world), np.asarray(probs), np.asarray(seq), np.asarray(src))
            )

    results = {m.name: m.compute() for m in metrics}
    if std_cnt:
        results["agent_std_mean"] = std_sum / std_cnt

    out_dir = os.path.join(os.path.dirname(ckpt_dir), "out")
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.ckpt.rstrip("/")))[0]
    out_path = os.path.join(out_dir, f"result_{stem}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    if submissions:
        # keyed by scene identity (the reference's result JSON is keyed per
        # sample, ``model_base_mix.py:152-167``)
        np.savez(
            os.path.join(out_dir, f"submission_{stem}.npz"),
            trajectories=np.concatenate([w for w, _, _, _ in submissions]),
            probabilities=np.concatenate([p for _, p, _, _ in submissions]),
            seq_ids=np.concatenate([s for _, _, s, _ in submissions]),
            sources=np.concatenate([c for _, _, _, c in submissions]),
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
