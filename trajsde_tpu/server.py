"""Production serving engine: bucketed micro-batching over the jitted model.

The reference has no serving story beyond ``trainer.test`` (its L2 layer,
``/root/reference/test.py:58``); this subsystem is the deployment analog
this framework adds.  It wraps either serving engine —

- ``"kernel"``: the VMEM-resident Pallas rollout
  (:func:`trajsde_tpu.serving.make_serving_fn`; Rademacher increments are
  the measured-fastest path, metric-equivalent to gaussian at K=10 —
  PERF.md "Serving-engine metric equivalence"), or
- ``"scan"``: the exact training-path forward (XLA scan, gaussian path
  law)

— behind a request API with TPU-friendly batching discipline:

- **bucketed shapes**: requests are padded to the next power-of-two
  batch bucket so XLA compiles a handful of executables once instead of
  one per request count (the same discipline as the training loader's
  actor/lane buckets, ``data/loader.py:170-180``);
- **micro-batching**: a background worker drains the request queue up to
  ``max_batch`` or ``max_wait_ms``, so concurrent callers share one
  device dispatch (PyG DataLoader has no serving analog);
- **latency accounting**: per-request submit→result wall times, batch
  occupancy, p50/p99 (``stats()``);
- **multi-chip data parallelism** (``shard=True``): the scan engine
  places each padded bucket scene-sharded over a per-bucket data mesh
  (:func:`trajsde_tpu.parallel.mesh.make_mesh_for_batch`) and the jitted
  forward is partitioned by GSPMD — params replicate, activations split,
  results gather back on the host.  The kernel engine's Pallas rollout is
  an opaque custom call GSPMD cannot split, so it is instead wrapped in
  ``shard_map`` over the flattened ``B·F·A`` row axis (the rollout's
  natural parallel axis — even a 1-scene bucket fans out over all chips
  whose count divides the rows); see
  :func:`trajsde_tpu.serving.make_serving_fn`.

- **pipelined bulk predict**: ``predict`` keeps one batch in flight —
  batch ``i+1`` is aligned/packed/dispatched before batch ``i``'s
  results are fetched (JAX dispatch is async; only ``device_get``
  blocks), overlapping the host stages and the result transfer with the
  device's compute.  Exact (same chunking, buckets, key stream;
  ``pipeline=False`` restores the serial path).

- **slim results** (``slim=True``): the jitted pipeline returns (and the
  host fetches) only the focal-agent fields — ``agent_world``,
  ``agent_pi`` (+ OOD scores) — instead of the dense ``[B,K,A,Tf,2]``
  per-actor grids; at production capacity that is ~1 MiB instead of
  ~35 MiB of device→host result traffic per 128-scene batch, the
  binding stage on a relay-attached host (PERF.md round 5).  Default
  off: in-process consumers (``test.py --serving`` metrics, batch-mode
  npz dumps) want the full grids.

- **OOD scoring** (``ood=True``): every served scene also carries the
  paper's OOD score — per-actor embedding stds over the encoder's
  ``eval_iter`` stochastic re-runs (``ood_std`` ``[A]`` + the focal
  ``agent_std`` scalar), with predictions decoded from the ensemble-mean
  embedding exactly like the eval path (reference ``test.py --ood`` →
  ``model_base_mix_sde.py:89-98``; the reference can only score OOD
  offline through ``trainer.test``).

Single-scene use is ``predict([raw_scene])``; concurrent producers use
``submit(raw_scene) -> Future``.  Raw scenes are preprocessor-output
dicts (the ``.npz`` shard schema) — the engine applies the SAME runtime
grid alignment as training (``data/grid.py:align_to_grid``) so serving
inputs need no separate pipeline.
"""
from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.data.grid import NUS_SCALE, align_to_grid
from trajsde_tpu.data.pack import pack_scenes, pick_bucket


def _set_future(f: Future, result=None, exc=None) -> None:
    """Resolve a RUNNING future, tolerating a concurrent cancel: an
    InvalidStateError here must never escape into (and kill) the
    micro-batch worker thread."""
    try:
        if exc is not None:
            f.set_exception(exc)
        else:
            f.set_result(result)
    except Exception:  # cancelled/already-done: the caller walked away
        pass


def derive_key_data(seed: int, counter: int, shape) -> np.ndarray:
    """Host-side deterministic PRNG key material for (seed, counter).

    Built with numpy so the serving hot path dispatches no eager
    ``fold_in`` per request (each eager op is a device round trip —
    ~30-40 ms through this environment's relay).  Any distinct uint32
    pattern is a valid key for the counter-based impls (threefry
    shape ``(2,)``, rbg ``(4,)``); distinct (seed, counter) pairs give
    independent streams.
    """
    kd = np.zeros(shape, np.uint32)
    flat = kd.reshape(-1)
    if flat.size >= 2:
        flat[0] = np.uint32(seed & 0xFFFFFFFF)
        flat[-1] = np.uint32(counter & 0xFFFFFFFF)
    else:
        flat[0] = np.uint32(mix_seed(seed, counter))
    return kd


def mix_seed(seed: int, counter: int) -> int:
    """splitmix64-mix (seed, counter) into one well-distributed 31-bit
    seed.  A plain ``seed*K + counter`` makes the streams of adjacent
    engine seeds overlap after ~K requests; the finalizer's avalanche
    keeps distinct (seed, counter) pairs effectively independent."""
    x = (((seed & 0xFFFFFFFF) << 32) | (counter & 0xFFFFFFFF)) & 0xFFFFFFFFFFFFFFFF
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return x & 0x7FFFFFFF


def make_postprocess(is_gtabs: bool, ref_time: int, slim: bool = False):
    """Focal-agent world-frame projection — the submission math shared by
    ``test.py --submit`` and the serving engine: agent modes rotated back
    out of the agent frame and offset by the reference-time origin.

    Delta-target mode (``is_gtabs=False``): model outputs are per-step
    displacements in the GRID space — nuScenes rows carry the ÷5 coordinate
    scaling (``data/grid.py:64-72``, reference
    ``nuScenes_Argoverse.py:161-168``) — so the world projection cumsums
    them and multiplies nuScenes rows back to meters before adding the
    meter-space origin.  The returned ``loc`` stays in grid space
    (cumulative absolute), consistent with what metrics consume.

    ``slim=True`` drops the dense per-actor grids (``loc`` ``[B,K,A,Tf,2]``
    and ``pi_all``) from the RETURNED dict so the jitted pipeline fetches
    only the focal-agent fields — at B=128/A=48 that shrinks the
    device→host result from ~35 MiB to ~1 MiB per batch, which on a
    relay-attached host is the difference between transfer-bound and
    device-bound serving (PERF.md round 5).  The on-device math is
    unchanged (``agent_world`` still gathers from the full grid).
    """
    from trajsde_tpu.train.loop import gather_agent

    @jax.jit
    def _postprocess(scene, out):
        loc = out["loc"][..., :2]
        if not is_gtabs:  # delta targets → cumulative absolute
            loc = jnp.cumsum(loc, axis=-2)
            scale = jnp.where(scene.source == 0, NUS_SCALE, 1.0)
            loc_m = loc * scale.reshape(scale.shape + (1,) * (loc.ndim - 1))
        else:
            loc_m = loc
        idx = scene.agent_index
        agent_loc = gather_agent(loc_m, idx, axis=2)  # [B, K, Tf, 2]
        ang = gather_agent(scene.rotate_angles, idx, axis=1)
        c, s = jnp.cos(ang), jnp.sin(ang)
        rot_t = jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)
        origin = gather_agent(scene.positions[:, :, ref_time], idx, axis=1)
        world = (
            jnp.einsum("bktj,bji->bkti", agent_loc, rot_t)
            + origin[:, None, None]
        )
        pi = jax.nn.softmax(gather_agent(out["pi"], idx, axis=1), axis=-1)  # [B, K]
        res = {"agent_world": world, "agent_pi": pi}
        if not slim:
            res["loc"] = loc
            res["pi_all"] = out["pi"]
        if "stds" in out:  # OOD mode: per-actor scores + the focal scalar
            # f32 scores regardless of the model's compute dtype: the
            # npz writers downstream can't serialize ml_dtypes bf16
            stds = out["stds"].astype(jnp.float32)
            res["stds"] = stds
            res["agent_std"] = gather_agent(stds, idx, axis=1)
        return res

    return _postprocess


def align_scene(raw: Dict[str, np.ndarray], is_gtabs: bool = True) -> Tuple[Dict, int]:
    """Validate + grid-align one raw scene; returns ``(aligned, seq_id)``
    with seq_id = -1 when the scene carries no identity (a slot index
    would depend on micro-batch grouping, not on the scene).  The single
    alignment path shared by the engine and ``serve.py``'s init template.
    """
    sid = int(np.asarray(raw["seq_id"])) if "seq_id" in raw else -1
    aligned = align_to_grid(
        dict(raw, source=raw.get("source", np.int32(0))),
        is_gtabs=is_gtabs,
    )
    return aligned, sid


class ServingEngine:
    def __init__(
        self,
        model,
        params: Dict[str, Any],
        *,
        num_actors: int,
        num_lanes: int,
        engine: str = "auto",
        increments: str = "rademacher",
        batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128),
        max_batch: Optional[int] = None,
        max_wait_ms: float = 5.0,
        is_gtabs: bool = True,
        ref_time: int = 20,
        shard: bool = False,
        seed: int = 0,
        ood: bool = False,
        slim: bool = False,
    ) -> None:
        if engine == "auto":
            from trajsde_tpu.models.decoders import SDEDecoder

            # non-SDE decoders have no latent rollout for the kernel to fuse
            engine = (
                "kernel"
                if (
                    jax.default_backend() == "tpu"
                    and isinstance(model.decoder, SDEDecoder)
                    and getattr(model.decoder, "sde_layers", 2) == 2
                )
                else "scan"
            )
        if engine not in ("kernel", "scan", "exported"):
            raise ValueError(f"unknown serving engine {engine!r}")
        if shard and engine == "exported":
            raise ValueError(
                "shard=True cannot partition a deserialized export artifact "
                "(an opaque StableHLO call); re-export per topology or use "
                "the 'scan'/'kernel' engines"
            )
        if ood and engine == "exported":
            raise ValueError(
                "ood=True needs the live model (the OOD ensemble is not part "
                "of an exported pipeline); use the 'scan'/'kernel' engines"
            )
        if slim and engine == "exported":
            raise ValueError(
                "slim=True cannot shrink a deserialized export artifact's "
                "outputs (the StableHLO pipeline is frozen with the full "
                "result set); use the 'scan'/'kernel' engines"
            )
        if ood and not hasattr(model.encoder, "forward_ood"):
            raise NotImplementedError(
                f"ood=True needs an encoder with forward_ood (OOD ensemble "
                f"scoring); {type(model.encoder).__name__} has none"
            )
        self.ood = ood
        self.slim = slim
        self.engine = engine
        self.num_actors = num_actors
        self.num_lanes = num_lanes
        self.is_gtabs = is_gtabs
        self.max_wait_ms = max_wait_ms
        self.buckets = tuple(
            b for b in sorted(batch_buckets) if max_batch is None or b <= max_batch
        )
        if not self.buckets:
            raise ValueError(
                f"max_batch={max_batch} excludes every batch bucket "
                f"{tuple(sorted(batch_buckets))}"
            )
        self.max_batch = self.buckets[-1]
        self._model = model
        self._ref_time = ref_time
        self._seed = int(seed)
        self._counter = 0
        self._lock = threading.Lock()
        # key material is derived HOST-side per batch (no eager fold_in
        # dispatch in the hot path); shape follows the PRNG impl — or, for
        # artifacts, whatever impl the exporter recorded in the manifest
        if engine == "exported":
            self._kd_shape = tuple(model.manifest["key_data"]["shape"])
        else:
            self._kd_shape = jax.random.key_data(jax.random.key(0)).shape
        # data-parallel serving: shard each bucket over the data mesh (per
        # bucket, since the gcd device count depends on the batch size);
        # XLA splits the whole forward across chips, results gather back.
        # The kernel engine shards over the flattened B·F·A ROW axis
        # instead (the rollout's natural parallel axis — every bucket uses
        # all devices whose count divides the rows, even bucket 1), so its
        # meshes are keyed by rows, not scenes.
        self._meshes = {}
        if shard:
            from trajsde_tpu.parallel import mesh as mesh_lib

            self._mesh_lib = mesh_lib
            if engine != "kernel":
                for b in self.buckets:
                    self._meshes[b] = mesh_lib.make_mesh_for_batch(b)

        # forward + world-frame postprocess fuse into ONE jitted pipeline:
        # a served batch costs exactly one device dispatch (each dispatch
        # is a relay round trip in this environment)
        if engine == "exported":
            # ``model`` is a loaded deploy.ExportedServing: a frozen
            # StableHLO pipeline (forward + world-frame postprocess with
            # the weights baked in), so no flax tracing either
            self._serve = model
        elif engine == "kernel":
            from trajsde_tpu.serving import make_serving_fn

            dec = model.decoder
            self._kdims = (dec.future_steps, dec.num_modes, dec.local_channels)
            post = make_postprocess(self.is_gtabs, self._ref_time, slim=slim)

            def _make_kserve(mesh):
                base = make_serving_fn(
                    model,
                    {"params": params},
                    interpret=jax.default_backend() != "tpu",
                    increments=increments,
                    mesh=mesh,
                    ood=ood,
                )

                @jax.jit
                def _kserve(scene, key_data, seed, noise):
                    out = base(scene, jax.random.wrap_key_data(key_data),
                               seed, noise)
                    return post(scene, out)

                return _kserve

            if shard:
                # one serve fn per distinct row mesh (buckets with the same
                # divisor share one); jit still retraces per bucket shape
                self._kserves = {}
                by_ndev: Dict[int, Any] = {}
                Tf, K, A = self._kdims[0], self._kdims[1], num_actors
                for b in self.buckets:
                    m = self._mesh_lib.make_mesh_for_batch(b * K * A)
                    n = m.devices.size
                    if n not in by_ndev:
                        by_ndev[n] = _make_kserve(m)
                    self._kserves[b] = by_ndev[n]
                self._serve = None
            else:
                self._serve = _make_kserve(None)
        else:
            self._params = params
            post = make_postprocess(self.is_gtabs, self._ref_time, slim=slim)

            # only SDE-family models take an `ood` kwarg — the baseline
            # PredictionModel.__call__ has no OOD ensemble (same pattern
            # as test.py); ood=True was already rejected above for
            # encoders without forward_ood
            kwargs = {"ood": True} if ood else {}

            @jax.jit
            def _fwd(scene, key_data):
                key = jax.random.wrap_key_data(key_data)
                out = model.apply({"params": params}, scene,
                                  rngs={"sde": key}, **kwargs)
                return post(scene, out)

            self._serve = _fwd

        # bounded windows: a long-running daemon must not grow without bound
        self._latencies = collections.deque(maxlen=100_000)
        self._batch_sizes = collections.deque(maxlen=100_000)
        self._t_first: Optional[float] = None
        self._t_last: Optional[float] = None
        self._served = 0

        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ API
    @classmethod
    def from_export(
        cls,
        path: str,
        *,
        max_batch: Optional[int] = None,
        max_wait_ms: float = 5.0,
        seed: int = 0,
    ) -> "ServingEngine":
        """Serve from a :mod:`trajsde_tpu.deploy` artifact directory.

        No config, checkpoint, or model code needed: buckets, packing
        dimensions, and the full compute pipeline come from the artifact.
        """
        from trajsde_tpu.deploy import load_serving

        exp = load_serving(path)
        return cls(
            exp,
            None,
            num_actors=exp.num_actors,
            num_lanes=exp.num_lanes,
            engine="exported",
            batch_buckets=exp.buckets,
            max_batch=max_batch,
            max_wait_ms=max_wait_ms,
            is_gtabs=exp.is_gtabs,
            ref_time=exp.ref_time,
            seed=seed,
        )

    def predict(self, raw_scenes: List[Dict[str, np.ndarray]],
                pipeline: bool = True) -> List[Dict]:
        """Synchronous batched prediction (pads to the covering bucket).

        ``pipeline=True`` (default) keeps ONE batch in flight: batch
        ``i+1`` is aligned, packed, and dispatched before batch ``i``'s
        results are fetched, so the host stages (align + pack + result
        assembly) and the device→host result transfer overlap the
        device's compute of the next batch — JAX dispatch is async, only
        ``device_get`` blocks.  Exact: batch boundaries, bucket choice,
        and the (seed, counter) key stream are identical either way.
        """
        out: List[Dict] = []
        pending = None  # (aligned_scenes, in-flight device results)
        for i in range(0, len(raw_scenes), self.max_batch):
            aligned = [self._align_scene(s)
                       for s in raw_scenes[i : i + self.max_batch]]
            if not pipeline:
                out.extend(self._run_batch(aligned))
                continue
            handle = self._dispatch_batch(aligned)
            if pending is not None:
                out.extend(self._collect_batch(*pending))
            pending = (aligned, handle)
        if pending is not None:
            out.extend(self._collect_batch(*pending))
        return out

    def submit(self, raw_scene: Dict[str, np.ndarray]) -> Future:
        """Enqueue one scene; the micro-batcher groups concurrent requests.

        Schema validation / grid alignment happens HERE, synchronously —
        a malformed scene raises to its own caller instead of poisoning
        whatever micro-batch it would have been grouped into.
        """
        aligned = self._align_scene(raw_scene)
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("engine is closed")
            self._q.put((aligned, fut, time.perf_counter()))
        return fut

    def warmup(self, raw_scene: Dict[str, np.ndarray],
               buckets: Optional[Sequence[int]] = None) -> None:
        """Compile the executables for the given batch buckets upfront."""
        aligned = self._align_scene(raw_scene)
        for b in buckets or self.buckets:
            self._run_batch([aligned] * b, record=False)

    def stats(self) -> Dict[str, float]:
        with self._lock:
            lat = np.asarray(self._latencies, np.float64) * 1e3
            # span runs first DISPATCH → last collect, so it covers every
            # served batch's full service time (valid from one batch on)
            span = (
                (self._t_last - self._t_first)
                if self._served > 0 and self._t_last and self._t_first
                else None
            )
            return {
                "served": self._served,
                "p50_ms": float(np.percentile(lat, 50)) if lat.size else None,
                "p99_ms": float(np.percentile(lat, 99)) if lat.size else None,
                "mean_batch": (
                    float(np.mean(self._batch_sizes)) if self._batch_sizes else None
                ),
                "scenes_per_sec": (self._served / span) if span else None,
            }

    def reset_stats(self) -> None:
        """Zero the latency/occupancy counters (e.g. between benchmark
        phases, so one phase's batches don't pollute the next's stats)."""
        with self._lock:
            self._latencies.clear()
            self._batch_sizes.clear()
            self._t_first = self._t_last = None
            self._served = 0

    def close(self) -> None:
        with self._submit_lock:
            self._closed = True
        self._q.put(None)
        # a worker mid-batch may be compiling a NEW bucket shape — 40-260 s
        # per executable through the remote TPU compile helper (CLAUDE.md)
        # — so the join budget must cover a compile, not just a step
        self._worker.join(timeout=600)
        if self._worker.is_alive():
            # genuinely stuck: leave the sentinel for it and return without
            # draining (stealing the sentinel here would strand the worker
            # in q.get() forever and fail requests it is still serving)
            return
        # fail anything still enqueued (items that slipped in between the
        # worker's sentinel exit and the flag flip) instead of leaving
        # their futures to hang forever
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[1].done():
                item[1].set_exception(RuntimeError("engine closed"))

    # ---------------------------------------------------------------- internals
    def _next_counter(self) -> int:
        with self._lock:
            self._counter += 1
            return self._counter

    def _align_scene(self, raw: Dict[str, np.ndarray]) -> Tuple[Dict, int]:
        return align_scene(raw, self.is_gtabs)

    def _run_batch(
        self, aligned_scenes: List[Tuple[Dict, int]], record: bool = True
    ) -> List[Dict]:
        return self._collect_batch(
            aligned_scenes, self._dispatch_batch(aligned_scenes, record),
            record,
        )

    def _dispatch_batch(self, aligned_scenes: List[Tuple[Dict, int]],
                        record: bool = True):
        """Pack and dispatch one batch; returns the in-flight device
        results WITHOUT blocking (JAX dispatch is async) so a caller can
        overlap the next batch's host stages with this one's compute."""
        if record:
            # the throughput span must start at the FIRST batch's
            # dispatch, not its collect — stamping t_first at collect
            # excludes the first batch's service time from the span and
            # overstates scenes_per_sec for short runs
            now = time.perf_counter()
            with self._lock:
                if self._t_first is None:
                    self._t_first = now
        n = len(aligned_scenes)
        bucket = pick_bucket(n, self.buckets)
        aligned = [a for a, _ in aligned_scenes]
        # padding copies are already aligned — duplicate, don't re-align.
        # use_native routes the gather-copy loop through the C++ packer
        # when its library is built (same default as the training loader;
        # measured 63→38 ms per 128-scene bucket on this host)
        padded = aligned + [aligned[-1]] * (bucket - n)
        # sharded buckets pack to NUMPY and transfer once inside
        # shard_batch's sharded device_put — as_jax=True here would first
        # ship the whole batch to device 0 and then re-place it (the same
        # double-transfer the training loader avoids, data/loader.py)
        sharded = bucket in self._meshes
        scene = pack_scenes(padded, self.num_actors, self.num_lanes,
                            use_native=True, as_jax=not sharded)
        if sharded:
            scene = self._mesh_lib.shard_batch(scene, self._meshes[bucket])
        # everything random is derived host-side from (seed, counter): the
        # hot path dispatches exactly ONE device computation per batch
        c = self._next_counter()
        kd = derive_key_data(self._seed, c, self._kd_shape)
        if self.engine == "kernel":
            seed = np.int32(mix_seed(self._seed, c))
            noise = None
            if jax.default_backend() != "tpu":
                # the CPU interpreter lacks the on-core PRNG primitives
                Tf, K, D = self._kdims
                noise = np.random.default_rng(
                    (self._seed & 0xFFFFFFFF, c)
                ).standard_normal(
                    (Tf, bucket * K * self.num_actors, D), np.float32
                )
            serve = self._serve if self._serve is not None else self._kserves[bucket]
            return serve(scene, kd, seed, noise)
        return self._serve(scene, kd)

    def _collect_batch(
        self, aligned_scenes: List[Tuple[Dict, int]], in_flight,
        record: bool = True,
    ) -> List[Dict]:
        n = len(aligned_scenes)
        post = jax.device_get(in_flight)
        if record:
            now = time.perf_counter()
            with self._lock:
                self._batch_sizes.append(n)
                self._served += n
                self._t_last = now  # t_first stamped at dispatch
        results = []
        for i in range(n):
            r = {
                "agent_world": post["agent_world"][i],
                "agent_pi": post["agent_pi"][i],
                "seq_id": np.int32(aligned_scenes[i][1]),
            }
            if not self.slim:
                r["loc"] = post["loc"][i]
                r["pi"] = post["pi_all"][i]
            if self.ood:
                r["ood_std"] = post["stds"][i]          # [A] per-actor score
                r["agent_std"] = post["agent_std"][i]   # focal-agent scalar
            results.append(r)
        return results

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            deadline = time.perf_counter() + self.max_wait_ms / 1e3
            while len(batch) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)  # re-post the sentinel for shutdown
                    break
                batch.append(nxt)
            # transition every future to RUNNING before compute: after
            # this point a caller's cancel() can no longer succeed, so
            # set_result/set_exception below cannot race it into an
            # InvalidStateError that would kill this worker thread.
            # Futures cancelled while queued are dropped from the batch.
            batch = [b for b in batch if b[1].set_running_or_notify_cancel()]
            if not batch:
                continue
            scenes = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            starts = [b[2] for b in batch]
            try:
                results = self._run_batch(scenes)
            except Exception as e:  # propagate to every waiting caller
                for f in futs:
                    _set_future(f, exc=e)
                continue
            done = time.perf_counter()
            with self._lock:
                self._latencies.extend(done - s for s in starts)
            for f, r in zip(futs, results):
                _set_future(f, result=r)
