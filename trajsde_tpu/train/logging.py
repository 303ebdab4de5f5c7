"""Experiment logging + observability.

Covers the reference's aux subsystems (SURVEY §5): TensorBoard-compatible
scalar logging (``train.py:53``), source snapshotting (the lost
``debug_util.save_modules`` capability, ``train.py:60``), profiler hooks
(``jax.profiler`` — nothing in the reference ever invoked its bundled
profilers), and NFE/steps-per-second counters as first-class metrics.
"""
from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, Optional

import jax

try:  # TensorBoard writer if available; JSONL always
    from torch.utils.tensorboard import SummaryWriter  # type: ignore

    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False


class ExperimentLogger:
    """Scalars to TensorBoard (if available) + append-only JSONL.

    :meth:`log_scalars_async` keeps the device→host scalar fetch OFF the
    training hot loop: through this environment's network relay each
    fetch is a ~30-40 ms round trip, and an in-line ``float(v)`` at
    ``--log-every 2`` serialized the step pipeline (measured in the
    round-4 shard soak).  A single worker thread drains a queue of
    (step, device-arrays) records; entries are written in submit order,
    so the JSONL stays monotonic.
    """

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        self._tb = (
            SummaryWriter(self.log_dir) if (_HAS_TB and use_tensorboard) else None
        )
        self._q = None  # async worker created lazily on first async log

    def _write(self, step: int, scalars: Dict[str, float], t: float) -> None:
        record = {"step": step, "time": t}
        # one batched transfer for the whole dict (vs a relay round trip
        # per scalar); host floats pass through device_get unchanged
        scalars = jax.device_get(scalars)
        for k, v in scalars.items():
            v = float(v)
            record[k] = v
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        self.flush()  # keep JSONL ordering vs any queued async records
        self._write(step, scalars, time.time())

    def log_scalars_async(self, step: int, scalars) -> None:
        """Enqueue a log record whose values may still be device arrays;
        the worker thread pays the transfer latency."""
        if self._q is None:
            import queue as queue_mod
            import threading

            self._q = queue_mod.Queue(maxsize=64)

            def drain():
                while True:
                    item = self._q.get()
                    if item is None:
                        return
                    try:
                        self._write(*item)
                    except Exception:  # never kill training over a log line
                        pass
                    finally:
                        self._q.task_done()

            self._worker = threading.Thread(target=drain, daemon=True)
            self._worker.start()
        self._q.put((step, scalars, time.time()))

    def flush(self) -> None:
        """Block until every queued async record is on disk."""
        if self._q is not None:
            self._q.join()

    def close(self) -> None:
        if self._q is not None:
            self.flush()
            self._q.put(None)
            self._worker.join(timeout=10)
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def snapshot_sources(log_dir: str, package_root: Optional[str] = None) -> str:
    """Copy the framework sources into the run directory.

    Restores the capability the reference lost with its missing
    ``debug_util.save_modules`` (``train.py:60``, SURVEY §1): every run
    archives the exact code that produced it.
    """
    if package_root is None:
        package_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(log_dir, "source_snapshot")
    if os.path.exists(dest):
        shutil.rmtree(dest)
    shutil.copytree(
        package_root,
        os.path.join(dest, os.path.basename(package_root)),
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so"),
    )
    return dest


class ProfilerHook:
    """``jax.profiler`` trace around a step window (SURVEY §5 rebuild item)."""

    def __init__(self, log_dir: str, start_step: int, num_steps: int = 5):
        self.trace_dir = os.path.join(log_dir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def on_step(self, step: int) -> None:
        # window test, not equality: a run resumed PAST start_step (the
        # step counter continues from the checkpoint) must still trace
        if self.start_step <= step < self.stop_step and not self._active:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            self.stop()

    def stop(self) -> None:
        """Flush an open trace (also called at fit() end so short runs
        still produce a profile)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
