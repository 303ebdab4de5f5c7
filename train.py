"""Training CLI (reference analog: ``train.py:19-66``).

    python train.py -c configs/nusargo/sde.yml -n my_run [--ckpt PATH]
                    [--wonly PATH] [--epochs N]

Wires config → model/losses/metrics/datamodule → mesh → Trainer, with
checkpoint resume, weights-only warm start, TensorBoard+JSONL logging and
a source snapshot of the framework into the run directory.
"""
from __future__ import annotations

import argparse
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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-n", "--name", required=True)
    parser.add_argument("--ckpt", default=None, help="resume full trainer state")
    parser.add_argument("--wonly", default=None, help="weights-only warm start")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--logdir", default="logs")
    parser.add_argument("--monitor", default="ADE_T")
    parser.add_argument("--num-actors", type=int, default=None,
                        help="actor capacity per scene (overrides config; "
                        "default: config value or 48)")
    parser.add_argument("--num-lanes", type=int, default=None,
                        help="lane capacity per scene (overrides config; "
                        "default: config value or 192)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--profile",
        type=int,
        default=None,
        metavar="STEP",
        help="capture a jax.profiler trace of 5 steps starting at STEP "
        "(written to <run_dir>/profile)",
    )
    parser.add_argument(
        "--log-every",
        type=int,
        default=1,
        help="train-scalar log cadence; each log syncs host<->device",
    )
    parser.add_argument(
        "--multihost",
        action="store_true",
        help="initialize jax.distributed from TRAJSDE_COORDINATOR / "
        "TRAJSDE_NUM_PROCESSES / TRAJSDE_PROCESS_ID before building the mesh",
    )
    parser.add_argument(
        "--zero1",
        action="store_true",
        help="ZeRO-1: shard the optimizer state (Adam moments) over the "
        "data axis — XLA emits the reduce-scatter/sharded-update/"
        "all-gather schedule from the layouts (tested equivalent to the "
        "replicated step)",
    )
    parser.add_argument(
        "--async-ckpt",
        action="store_true",
        help="overlap orbax checkpoint writes with the next epoch's "
        "training (the wait moves to the next save; preemption saves "
        "stay synchronous)",
    )
    parser.add_argument(
        "--accum",
        type=int,
        default=1,
        help="gradient accumulation: K loader batches per optimizer update "
        "(Lightning accumulate_grad_batches analog) — effective batch "
        "K*train_batch_size at single-batch activation memory",
    )
    parser.add_argument(
        "--chain",
        type=int,
        default=1,
        help="dispatch chaining: C optimizer updates per device dispatch "
        "(identical math, C* fewer host->device dispatches; use when "
        "per-dispatch latency binds e2e throughput — log/ckpt cadence "
        "coarsens to C)",
    )
    parser.add_argument(
        "--wire",
        action="store_true",
        help="pack each batch to one host->device buffer per dtype before "
        "the transfer (exact; the jitted step relayouts in-trace) — cuts "
        "per-leaf transfer round trips on relayed/remote TPU backends",
    )
    parser.add_argument(
        "--prng",
        default="rbg",
        choices=["rbg", "threefry2x32"],
        help="rbg is ~1.24x faster on TPU for the big dropout masks",
    )
    args = parser.parse_args()
    jax.config.update("jax_default_prng_impl", args.prng)

    from trajsde_tpu.config import build_losses, build_model, load_config
    from trajsde_tpu.data.loader import DataModuleNuArgoMix
    from trajsde_tpu.parallel import mesh as mesh_lib
    from trajsde_tpu.train.checkpoint import CheckpointManager
    from trajsde_tpu.train.logging import (
        ExperimentLogger,
        ProfilerHook,
        snapshot_sources,
    )
    from trajsde_tpu.train.loop import Trainer, create_train_state
    from trajsde_tpu.train.metrics import make_metrics
    from trajsde_tpu.train.optim import build_optimizer

    if args.multihost:
        n_proc = mesh_lib.init_multihost()
        print(f"multihost: {n_proc} processes, {len(jax.devices())} devices")

    cfg = load_config(args.config)
    ts_drop_cfg = cfg.model_kwargs.get("ts_drop")
    if ts_drop_cfg not in (None, False) and (
        ts_drop_cfg is True or not 0.0 <= float(ts_drop_cfg) < 1.0
    ):
        # the reference's `rand > (1 - ts_drop)` has the same degeneracy:
        # rate 1.0 (or boolean true) deletes the entire history
        raise SystemExit(
            "config error: ts_drop must be a drop RATE in [0, 1) "
            f"(e.g. 0.1), got {ts_drop_cfg!r} — rate 1.0 would zero "
            "every historical step"
        )
    # multi-process runs: only process 0 owns run-dir side effects (source
    # snapshot, metrics.jsonl, checkpoint/leaderboard writes) — concurrent
    # writers race on the same files (Lightning gates DDP logging the
    # same way); restores still happen on every process
    primary = jax.process_index() == 0
    run_dir = os.path.join(args.logdir, args.name)
    os.makedirs(run_dir, exist_ok=True)
    if primary:
        snapshot_sources(run_dir)

    dm_kwargs = dict(cfg.datamodule)
    # explicit CLI flags override the config (conventional precedence)
    if args.num_actors is not None:
        dm_kwargs["num_actors"] = args.num_actors
    if args.num_lanes is not None:
        dm_kwargs["num_lanes"] = args.num_lanes
    # --seed drives the data order/augmentation streams too (Lightning's
    # seed_everything analog); an explicit config seed wins
    dm_kwargs.setdefault("seed", args.seed)
    datamodule = DataModuleNuArgoMix(**dm_kwargs)
    steps_per_epoch = max(1, len(datamodule.train_loader()))

    model = build_model(cfg)
    losses = build_losses(cfg)
    metrics = make_metrics(
        [n for n, _ in cfg.metric_specs],
        [dict(a) for _, a in cfg.metric_specs],
    )
    # with gradient accumulation the LR schedule advances once per
    # OPTIMIZER UPDATE, i.e. once per K loader batches (ceil for the
    # trailing partial group, which still steps).  Under bucket mode the
    # per-bucket partial flushes can add a few extra updates per epoch —
    # the schedule then reaches its floor slightly early, which only
    # clamps the terminal LR
    updates_per_epoch = max(1, -(-steps_per_epoch // max(1, args.accum)))
    optimizer = build_optimizer(cfg.training, updates_per_epoch)

    # the datamodule's resolved batch size (config default included) sizes
    # the data mesh — a config omitting train_batch_size still trains at
    # the loader default, so the mesh must match it
    mesh = mesh_lib.make_mesh_for_batch(datamodule.train_batch_size)
    from trajsde_tpu.data.scene import strip_for_device
    from trajsde_tpu.data.wire import pack_wire

    example = mesh_lib.shard_batch(
        strip_for_device(datamodule.train_loader().first_batch()), mesh
    )
    state = create_train_state(model, optimizer, example, seed=args.seed)
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    if args.zero1:
        state = state.replace(
            opt_state=mesh_lib.shard_opt_state(state.opt_state, mesh)
        )

    checkpointer = CheckpointManager(
        os.path.join(run_dir, "checkpoints"), async_save=args.async_ckpt
    )
    if args.ckpt:
        state = checkpointer.restore(state, args.ckpt)
    elif args.wonly:
        state = state.replace(params=checkpointer.restore_params(state.params, args.wonly))

    ts_drop = cfg.model_kwargs.get("ts_drop", False)
    trainer = Trainer(
        model=model,
        optimizer=optimizer,
        losses=losses,
        metrics=metrics,
        logger=ExperimentLogger(run_dir) if primary else None,
        checkpointer=checkpointer if primary else None,
        monitor=args.monitor,
        ts_drop_rate=float(ts_drop) if ts_drop else 0.0,
        is_gtabs=(cfg.datamodule.get("val_dataset_args") or {}).get("is_gtabs", True),
        profiler=(
            ProfilerHook(run_dir, args.profile)
            if (args.profile is not None and primary)
            else None
        ),
        log_every=max(1, args.log_every),
        accum_steps=max(1, args.accum),
        chain_steps=max(1, args.chain),
        wire=args.wire,
    )
    max_epochs = (
        args.epochs if args.epochs is not None
        else cfg.training.get("max_epochs", 1)
    )

    def train_batches():
        # --wire packs host batches to one buffer per dtype BEFORE the
        # sharded placement (shard_batch is pytree-generic, so the wire
        # buffers shard along their scene axis like the unpacked fields);
        # the jitted steps relayout in-trace (data/wire.py)
        wire_fn = pack_wire if args.wire else (lambda b: b)
        n_group = (args.accum > 1) + (args.chain > 1)
        if n_group:
            # group HOST-side (numpy np.stack) before the single device
            # transfer per group — eager per-leaf stacking of sharded
            # arrays would round-trip the TPU relay per leaf.  Axis order:
            # [chain,][micro,] batch (chain outermost)
            from trajsde_tpu.train.loop import group_microbatches

            # strip_for_device BEFORE grouping: the dead fields never get
            # host-stacked, let alone transferred
            stream = map(strip_for_device, datamodule.train_loader())
            if args.accum > 1:
                stream = group_microbatches(stream, args.accum)
            if args.chain > 1:
                stream = group_microbatches(stream, args.chain)
            for group in stream:
                yield mesh_lib.shard_batch(wire_fn(group), mesh, batch_axis=n_group)
        else:
            for batch in datamodule.train_loader():
                yield mesh_lib.shard_batch(wire_fn(strip_for_device(batch)), mesh)

    def val_batches():
        wire_fn = pack_wire if args.wire else (lambda b: b)
        for batch in datamodule.val_loader():
            yield mesh_lib.shard_batch(wire_fn(strip_for_device(batch)), mesh)

    trainer.fit(state, train_batches, val_batches, max_epochs=max_epochs)


if __name__ == "__main__":
    main()
