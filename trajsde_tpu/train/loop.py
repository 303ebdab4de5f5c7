"""Training / evaluation loops — the experiment orchestration layer.

TPU-native replacement for the reference's PyTorch-Lightning wiring
(``train.py:19-66``, ``models/model_base_mix*.py:95-167``): a jitted
train step (forward + weighted losses + AdamW update) over a data-parallel
mesh, a jitted eval step that emits (sum, count) metric contributions
reduced with ``psum`` semantics, explicit epoch-boundary metric resets
(the reference forgot these — SURVEY §2.2 warts), and checkpointing of
(params, opt state, PRNG key, step).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from trajsde_tpu.data.scene import SceneBatch, strip_for_device
from trajsde_tpu.data.wire import WireBatch, pack_wire, unpack_if_wire


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    key: jax.Array


def create_train_state(model, optimizer, example_scene: SceneBatch, seed: int = 0):
    key = jax.random.key(seed)
    pkey, skey, rest = jax.random.split(key, 3)
    variables = jax.jit(model.init)({"params": pkey, "sde": skey}, example_scene)
    params = variables["params"]
    opt_state = jax.jit(optimizer.init)(params)
    return TrainState(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32), key=rest
    )


def gather_agent(arr: jax.Array, agent_index: jax.Array, axis: int) -> jax.Array:
    """Select the focal-agent slot per scene along ``axis``."""
    shape = [1] * arr.ndim
    shape[0] = arr.shape[0]
    idx = agent_index.reshape(shape).astype(jnp.int32)
    idx = jnp.broadcast_to(idx, arr.shape[:axis] + (1,) + arr.shape[axis + 1 :])
    return jnp.take_along_axis(arr, idx, axis=axis)[
        tuple(slice(None) if i != axis else 0 for i in range(arr.ndim))
    ]


def agent_slices(
    scene: SceneBatch, output: Dict[str, jax.Array], is_gtabs: bool = True
):
    """(pred [B,K,Tf,2], target [B,Tf,2], reg_mask [B,Tf], source [B]) —
    the focal-agent views metrics consume (``model_base_mix.py:121-124``).

    ``is_gtabs=False`` (delta-target mode) cumsums both the predicted and
    target displacements back into the absolute agent frame before metric
    computation (``model_base_mix.py:143-145``).  Deviation noted for the
    record: the reference applies the conversion only in ``test_step`` and
    evaluates *validation* metrics in delta space — here both eval paths
    convert, so the monitored metric is always cumulative-absolute.

    Reference quirk preserved (do not "fix"): like ``test_step:144-145``,
    the cumsum does NOT undo the nuScenes ÷5 grid scaling, so in delta
    mode nuScenes rows are measured in grid units (meters/5) while
    Argoverse rows are meters — metric parity with the reference over
    meter-true nuScenes numbers.  The submission/serving world projection
    (``server.py:make_postprocess``) IS meter-true; only the metric path
    mirrors the reference.
    """
    pred = gather_agent(output["loc"][..., :2], scene.agent_index, axis=2)
    target = gather_agent(output["y"], scene.agent_index, axis=1)
    reg_mask = gather_agent(output["reg_mask"], scene.agent_index, axis=1)
    if not is_gtabs:
        pred = jnp.cumsum(pred, axis=-2)
        target = jnp.cumsum(target, axis=-2)
    return pred, target, reg_mask, scene.source


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    losses: List[Tuple[str, float, Callable]],
    donate: bool = True,
    ts_drop_rate: float = 0.0,
    accum_steps: int = 1,
    chain_steps: int = 1,
) -> Callable:
    """Build the jitted train step: grads of the weighted loss sum.

    Under a sharded batch, XLA inserts the gradient ``psum`` over the data
    axis automatically (the NCCL-allreduce equivalent, SURVEY §2.9).
    ``ts_drop_rate > 0`` enables the reference's random historical-timestep
    masking regularization (``model_base_mix.py:96-101``).

    ``accum_steps > 1`` enables gradient accumulation (the Lightning
    ``accumulate_grad_batches`` capability of the reference's L2 layer):
    the step then expects ``scene`` leaves stacked with a leading micro
    axis ``[k, ...]`` and runs the micro-batches through a ``lax.scan``
    accumulating averaged grads — one optimizer update, micro-batch-sized
    activation memory.  This trains effective batch ``k·B`` where direct
    ``B=256`` spills HBM (PERF.md B=256 root cause).

    ``chain_steps > 1`` chains C full optimizer UPDATES into one device
    dispatch (scenes stacked ``[C, ...]``; composes with accumulation as
    ``[C, K, B, ...]``): identical math to C separate calls, C× fewer
    host→device dispatches — the lever when per-dispatch latency binds
    e2e throughput (this environment's relay costs ~30-40 ms/dispatch).
    """

    def loss_fn(params, scene, sde_key, drop_key):
        if ts_drop_rate:
            from trajsde_tpu.data.transforms import ts_drop

            scene = ts_drop(scene, ts_drop_rate, jax.random.fold_in(drop_key, 1))
        out = model.apply(
            {"params": params},
            scene,
            deterministic=False,
            rngs={"sde": sde_key, "dropout": drop_key},
        )
        total = 0.0
        logs = {}
        for name, weight, fn in losses:
            value = fn(out["y"], out)
            total = total + weight * value
            logs[f"train/{name}"] = value
        return total, logs

    def grads_of(params, scene, sde_key, drop_key):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, scene, sde_key, drop_key
            )

        def body(carry, micro):
            acc, i = carry
            (loss_i, logs_i), g_i = jax.value_and_grad(loss_fn, has_aux=True)(
                params,
                micro,
                jax.random.fold_in(sde_key, i),
                jax.random.fold_in(drop_key, i),
            )
            acc = jax.tree.map(lambda a, b: a + b, acc, g_i)
            return (acc, i + 1), (loss_i, logs_i)

        zeros = jax.tree.map(jnp.zeros_like, params)
        (acc, _), (loss_k, logs_k) = jax.lax.scan(
            body, (zeros, jnp.int32(0)), scene
        )
        # divide by the group's ACTUAL micro count (a trailing partial
        # group is a smaller accumulation, not dropped data)
        inv = 1.0 / jax.tree.leaves(scene)[0].shape[0]
        grads = jax.tree.map(lambda g: g * inv, acc)
        loss = jnp.mean(loss_k)
        logs = jax.tree.map(jnp.mean, logs_k)
        return (loss, logs), grads

    def update_body(state: TrainState, scene: SceneBatch):
        key, sde_key, drop_key = jax.random.split(state.key, 3)
        (loss, logs), grads = grads_of(state.params, scene, sde_key, drop_key)
        # failure detection: a non-finite loss/grad step is SKIPPED rather
        # than written into the parameters (the reference has no such
        # guard — SURVEY §5 "failure detection: none")
        grads_ok = jnp.isfinite(loss) & jax.tree_util.tree_reduce(
            jnp.logical_and,
            jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads),
            jnp.bool_(True),
        )
        safe_grads = jax.tree.map(lambda g: jnp.where(grads_ok, g, 0.0), grads)
        updates, opt_state = optimizer.update(safe_grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: jnp.where(grads_ok, u, 0.0), updates)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(grads_ok, new, old)
            if hasattr(new, "shape") and new.shape == getattr(old, "shape", None)
            else new,
            opt_state,
            state.opt_state,
        )
        params = optax.apply_updates(state.params, updates)
        logs["train/total"] = loss
        logs["train/step_skipped"] = 1.0 - grads_ok.astype(jnp.float32)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        return new_state, logs

    if chain_steps == 1:

        @partial(jax.jit, donate_argnums=(0,) if donate else ())
        def train_step(state: TrainState, scene):
            # wire-format batches relayout to field shapes IN-TRACE: the
            # flat per-dtype buffers were the fast host→device path; the
            # reshape back runs here at HBM bandwidth (data/wire.py)
            return update_body(state, unpack_if_wire(scene))

        return train_step

    # dispatch chaining: C FULL optimizer updates per device dispatch over
    # scenes stacked [C, ...] on a leading chain axis.  Each dispatch is a
    # network round trip through this environment's TPU relay (~30-40 ms),
    # which binds e2e throughput once the loader is fast (PERF.md round 4
    # shard soak: 230 ms/step e2e vs the 167 ms device step); chaining
    # amortizes it C-fold.  Composes with accum (scenes [C, K, B, ...]).
    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def chained_step(state: TrainState, scenes: SceneBatch):
        state, logs_c = jax.lax.scan(update_body, state, unpack_if_wire(scenes))
        logs = jax.tree.map(jnp.mean, logs_c)
        # skip accounting stays a COUNT (a NaN burst inside a chain must
        # not average away); the mean of the rest matches log semantics
        logs["train/step_skipped"] = jnp.sum(logs_c["train/step_skipped"])
        return state, logs

    return chained_step


def make_eval_step(model, metrics, is_gtabs: bool = True) -> Callable:
    """Jitted eval step → per-metric (sum, count) contributions."""

    @jax.jit
    def eval_step(params, scene: SceneBatch, sde_key, batch_idx):
        scene = unpack_if_wire(scene)
        # fold_in INSIDE the trace: an eager per-batch fold_in is one
        # device round trip per val batch on the remote TPU backend
        sde_key = jax.random.fold_in(sde_key, batch_idx)
        out = model.apply({"params": params}, scene, rngs={"sde": sde_key})
        pred, target, reg_mask, source = agent_slices(scene, out, is_gtabs)
        return {
            m.name: m.update_fn(pred, target, reg_mask, source) for m in metrics
        }

    return eval_step


def group_microbatches(batches, k: int):
    """Stack ``k`` consecutive same-shape batches onto a leading micro axis.

    Host-side grouping for gradient accumulation: numpy leaves stack with
    ``np.stack`` (one device transfer per GROUP downstream, instead of one
    eager relay dispatch per leaf).  Batches are buffered per shape, so a
    bucketing loader's mixed (A, L) shapes group with their own kind.  A
    trailing partial group still trains as a smaller accumulation
    (Lightning ``accumulate_grad_batches`` semantics — no data dropped);
    the grad average divides by the group's ACTUAL size.
    """

    def stack_group(buf):
        leaf = jax.tree.leaves(buf[0])[0]
        stack = np.stack if isinstance(leaf, np.ndarray) else jnp.stack
        return jax.tree.map(lambda *xs: stack(xs), *buf)

    def shape_key(scene):
        # EVERY leaf shape: the bucketing loader picks actor and lane
        # buckets independently, so x.shape alone would group mixed-L
        # batches together and crash the stack
        return tuple(
            getattr(x, "shape", None) for x in jax.tree.leaves(scene)
        )

    # NOTE: each distinct (shape, group-size) pair compiles its own train
    # step — partial trailing groups add at most one K'<K executable per
    # bucket, compiled once and reused every epoch thereafter
    buffers: Dict[tuple, list] = {}
    for scene in batches:
        key = shape_key(scene)
        buffers.setdefault(key, []).append(scene)
        if len(buffers[key]) == k:
            yield stack_group(buffers.pop(key))
    for buf in buffers.values():
        yield stack_group(buf)


def device_prefetch(iterator, size: int = 2, wire: bool = False):
    """Double-buffered host→device pipeline: keep ``size`` batches in
    flight so packing/transfer overlaps device compute (the reference
    leans on 32 dataloader workers + pinned memory for the same overlap,
    ``Datamodule_nuargo_mix.py:33-44``).

    The pull + ``device_put`` runs in a background thread: in this
    environment the transfer rides a network relay where ``device_put``
    can block for tens of ms, and the loader's host-side pack costs
    ~60 ms/batch — in-line, both serialize with the step dispatch (the
    round-4 shard soak measured 299 ms/step e2e vs the 167 ms device
    step).  A deque of futures would not help: the generator only
    advances between steps.  Exceptions from the loader/transfer
    re-raise at the consuming ``next()``."""
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def _put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                # host-resident batches shed their device-unused fields
                # before the transfer (strip_for_device: goal one-hots,
                # future positions — exact, ~30% fewer wire bytes on real
                # preprocessed data).  Already-placed batches (the sharded
                # CLI path strips + transfers in its own generator) pass
                # through: slicing a device array here would be an eager
                # relay round trip.
                if isinstance(item, SceneBatch) and isinstance(
                    jax.tree.leaves(item)[0], np.ndarray
                ):
                    item = strip_for_device(item)
                    if wire:
                        # pack to one buffer per dtype: each pytree leaf
                        # of a device_put is its own transfer RPC on the
                        # relayed backend (PERF.md round 4 "wire format"),
                        # so 15 leaves → 3 cuts per-leaf round trips; the
                        # jitted step relayouts in-trace (unpack_if_wire)
                        item = pack_wire(item)
                if not _put(jax.device_put(item)):
                    return  # consumer abandoned the generator (preemption)
            _put(_END)
        except BaseException as e:  # surface loader errors to the consumer
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            out = q.get()
            if out is _END:
                return
            if isinstance(out, BaseException):
                raise out
            yield out
    finally:
        # consumer broke out early (e.g. preemption mid-eval): release the
        # worker so it stops pulling the underlying loader iterator
        stop.set()


@dataclass
class Trainer:
    """Minimal epoch-driven trainer (L2 analog of the Lightning Trainer)."""

    model: Any
    optimizer: optax.GradientTransformation
    losses: List[Tuple[str, float, Callable]]
    metrics: List[Any]
    logger: Optional[Any] = None
    checkpointer: Optional[Any] = None
    monitor: str = "ADE_T"
    ts_drop_rate: float = 0.0
    is_gtabs: bool = True        # delta-target mode converts eval to meters
    profiler: Optional[Any] = None  # ProfilerHook — jax.profiler trace window
    log_every: int = 1           # scalar-log cadence (each log syncs the host)
    preempt_signals: bool = True  # SIGTERM/SIGINT → emergency checkpoint + clean return
    accum_steps: int = 1         # gradient accumulation: k loader batches per
                                 # optimizer update (Lightning
                                 # accumulate_grad_batches capability).
                                 # Feed HOST batches (grouping np.stacks
                                 # before the device transfer, as train.py
                                 # does); pre-sharded device streams fall
                                 # back to eager jnp.stack, which round-trips
                                 # the TPU relay per leaf and drops sharding
    chain_steps: int = 1         # dispatch chaining: C optimizer updates per
                                 # device dispatch (amortizes per-dispatch
                                 # latency; logs/ckpt cadence coarsens to C)
    wire: bool = False           # pack host batches to one buffer per dtype
                                 # before the device transfer (data/wire.py);
                                 # exact — the jitted steps relayout in-trace

    def __post_init__(self):
        self.train_step = make_train_step(
            self.model, self.optimizer, self.losses,
            ts_drop_rate=self.ts_drop_rate, accum_steps=self.accum_steps,
            chain_steps=self.chain_steps,
        )
        self.eval_step = make_eval_step(self.model, self.metrics, self.is_gtabs)
        self._preempted = False

    def _grouped(self, batches):
        """Route batches through :func:`group_microbatches` unless the data
        pipeline already grouped them (extra leading axes on ``x``, whose
        base rank is 4 — e.g. ``train.py`` groups host-side before
        sharding so the np.stack never touches device arrays).
        ``chain_steps > 1`` stacks a leading chain axis on top of whatever
        accumulation grouping produced: ``[C,][K,] B, ...``."""
        n_extra = (self.accum_steps > 1) + (self.chain_steps > 1)
        if n_extra == 0:
            yield from batches
            return
        import itertools

        it = iter(batches)
        first = next(it, None)
        if first is None:
            return
        stream = itertools.chain([first], it)
        # group rank seen so far: extra axes left of the scene axis
        # (WireBatch buffers are [*groups, B, per_scene])
        n_seen = (
            len(first.lead_shape) - 1
            if isinstance(first, WireBatch)
            else first.x.ndim - 4
        )
        lead_dims = (
            first.lead_shape if isinstance(first, WireBatch) else first.x.shape
        )
        if n_seen == n_extra:  # pre-grouped upstream
            want = [k for k in (self.chain_steps, self.accum_steps) if k > 1]
            if list(lead_dims[:n_extra]) != want:
                import logging

                # a FULL pre-grouped axis that disagrees with the
                # configured grouping trains a different effective batch /
                # cadence than configured — loudly, not silently
                logging.getLogger(__name__).warning(
                    "pre-grouped leading axes %s != configured %s (chain, "
                    "accum); training proceeds at the incoming shape",
                    tuple(lead_dims[:n_extra]), tuple(want),
                )
            yield from stream
            return
        if self.accum_steps > 1:
            stream = group_microbatches(stream, self.accum_steps)
        if self.chain_steps > 1:
            stream = group_microbatches(stream, self.chain_steps)
        yield from stream

    def _install_preempt_handlers(self):
        """TPU-pod preemption delivers SIGTERM; Lightning (and the
        reference) just dies mid-step.  Here the signal sets a flag, the
        step loop finishes the in-flight step, saves an emergency
        checkpoint (kept by the pruner's ``keep_last``), and ``fit``
        returns cleanly so ``--ckpt`` resume loses at most one step.

        A SECOND SIGINT raises ``KeyboardInterrupt`` immediately — the
        graceful path polls the flag only between steps, so Ctrl-C must
        stay able to break out of a hung iterator or a minutes-long
        remote compile."""
        import signal
        import threading

        if not self.preempt_signals or threading.current_thread() is not threading.main_thread():
            return {}
        previous = {}

        def handler(signum, frame):
            if self._preempted and signum == signal.SIGINT:
                raise KeyboardInterrupt
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                previous[sig] = signal.signal(sig, handler)
            except (ValueError, OSError):  # non-main thread / exotic platform
                pass
        return previous

    @staticmethod
    def _restore_handlers(previous):
        import signal

        for sig, old in previous.items():
            # signal.signal returns None when the prior handler was
            # installed by non-Python code; None is not re-installable
            signal.signal(sig, signal.SIG_DFL if old is None else old)

    def _nfe_logs(self) -> Dict[str, float]:
        """Static function-evaluation counts per forward — the fixed-grid
        analog of the reference's fnfe/gnfe counters
        (``enc_hivt_nusargo_sde_sep2.py:447,459-481``, its only built-in
        instrumentation).  Under ``lax.scan`` the counts are compile-time
        constants, so they are logged once instead of incremented."""
        logs = {}
        enc = getattr(self.model, "encoder", None)
        if enc is not None and hasattr(enc, "minimum_step"):  # SDE encoder
            logs["nfe/encoder_sde_steps"] = float(enc.historical_steps)
            logs["nfe/encoder_g_evals"] = 2.0 * enc.historical_steps  # dual g
        dec = getattr(self.model, "decoder", None)
        if dec is not None and hasattr(dec, "max_fut_t"):  # SDE decoder
            logs["nfe/decoder_sde_steps"] = float(dec.future_steps)
        return logs

    def fit(
        self,
        state: TrainState,
        train_batches: Callable[[], Iterable[SceneBatch]],
        val_batches: Callable[[], Iterable[SceneBatch]],
        max_epochs: int,
    ) -> TrainState:
        # host-side step counter: reading ``state.step`` would force a
        # device sync every iteration
        step = int(state.step)
        if (
            self.checkpointer is not None
            and self.metrics
            and self.monitor not in {m.name for m in self.metrics}
        ):
            # a typo'd monitor would save every checkpoint with
            # metric=None and the pruner would destroy the real best
            raise ValueError(
                f"monitor {self.monitor!r} is not a registered metric "
                f"({sorted(m.name for m in self.metrics)})"
            )
        if self.logger is not None:
            nfe = self._nfe_logs()
            if nfe:
                self.logger.log_scalars(step, nfe)
        self._preempted = False  # stale flag must not abort a resumed fit()
        previous_handlers = self._install_preempt_handlers()
        try:
            for epoch in range(max_epochs):
                t0 = time.time()
                n_steps = 0
                scenes = 0
                skip_acc = None
                for scene in device_prefetch(
                    self._grouped(train_batches()), wire=self.wire
                ):
                    if self.profiler is not None:
                        # BEFORE the dispatch, with the step number this
                        # batch will carry — so `--profile N` traces
                        # steps N..N+4, not N+1..N+5
                        self.profiler.on_step(step + 1)
                    state, logs = self.train_step(state, scene)
                    # a chained dispatch advances the step counter by its
                    # (possibly partial trailing) chain length
                    lead_shape = (
                        scene.lead_shape
                        if isinstance(scene, WireBatch)
                        else scene.x.shape
                    )
                    n_inner = lead_shape[0] if self.chain_steps > 1 else 1
                    step += n_inner
                    n_steps += n_inner
                    # leading axes: [chain,][micro,] batch
                    lead = 1 + (self.chain_steps > 1) + (self.accum_steps > 1)
                    scenes += int(np.prod(lead_shape[:lead]))
                    sk = logs.get("train/step_skipped")
                    if sk is not None:
                        # device-side running total (no host sync): a NaN
                        # burst between log points must not be invisible
                        # at high --log-every
                        skip_acc = sk if skip_acc is None else skip_acc + sk
                        logs = dict(
                            logs, **{"train/steps_skipped_cum": skip_acc}
                        )
                    if self.logger is not None and (
                        step // self.log_every > (step - n_inner) // self.log_every
                    ):
                        # async: the device→host scalar fetch must not
                        # stall the step pipeline (each fetch is a relay
                        # round trip here); epoch/val logs stay sync
                        self.logger.log_scalars_async(step, logs)
                    if self._preempted:
                        return self._emergency_stop(state, step)
                # train-only wall BEFORE the val pass: perf/steps_per_s
                # must not absorb evaluation time (epoch_time_s stays
                # inclusive).  The loop no longer syncs per step (async
                # logging), so a value fetch closes the epoch timing —
                # otherwise this would measure dispatch rate, not
                # execution (CLAUDE.md "TPU microbenchmarks lie")
                float(jnp.sum(jax.tree.leaves(state.params)[0]))
                train_dt = time.time() - t0
                if self._preempted:
                    # SIGTERM can land between the last step and here; the
                    # val pass at production shapes takes minutes — save
                    # NOW, not after evaluate
                    return self._emergency_stop(state, step)
                results = self.evaluate(state, val_batches)
                if self._preempted:
                    # interrupted mid-eval: metrics are partial — save
                    # unscored rather than record a bogus monitor value
                    return self._emergency_stop(state, step)
                dt = time.time() - t0
                if self.logger is not None:
                    self.logger.log_scalars(
                        step,
                        {f"val/{k}": v for k, v in results.items()}
                        | {
                            "epoch_time_s": dt,
                            "epoch": epoch,
                            "perf/steps_per_s": n_steps / max(train_dt, 1e-9),
                            "perf/scenes_per_s": scenes / max(train_dt, 1e-9),
                            # distinct compiled train-step executables so
                            # far — bucketing/accumulation shape growth is
                            # observable, not silent (SURVEY §7 hard parts).
                            # _cache_size is a private jax.jit API: degrade
                            # to -1 rather than kill a run if it moves
                            "perf/compiled_steps": float(
                                getattr(self.train_step, "_cache_size", lambda: -1)()
                            ),
                        },
                    )
                if self.checkpointer is not None:
                    metric = results.get(self.monitor)
                    if metric is not None and not np.isfinite(metric):
                        # NaN (empty/filtered val split) must not enter the
                        # pruner's sort keys
                        metric = None
                    self.checkpointer.save(state, metric=metric, step=step)
        finally:
            self._restore_handlers(previous_handlers)
            if self.profiler is not None:
                self.profiler.stop()
            if self.checkpointer is not None and hasattr(self.checkpointer, "wait"):
                self.checkpointer.wait()  # land any in-flight async save
        return state

    def _emergency_stop(self, state: TrainState, step: int) -> TrainState:
        if self.checkpointer is not None:
            # synchronous: the process is about to die
            self.checkpointer.save(state, metric=None, step=step, wait=True)
        if self.logger is not None:
            self.logger.log_scalars(step, {"preempted": 1.0})
        return state

    def evaluate(self, state: TrainState, batches) -> Dict[str, float]:
        for m in self.metrics:
            m.reset()
        key = jax.random.key(12345)
        for i, scene in enumerate(device_prefetch(batches(), wire=self.wire)):
            if self._preempted:
                break  # fit() saves the emergency checkpoint
            contribs = self.eval_step(
                state.params, scene, key, np.int32(i)
            )
            for m in self.metrics:
                m.accumulate(contribs[m.name])
        return {m.name: m.compute() for m in self.metrics}
