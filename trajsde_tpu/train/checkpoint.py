"""Checkpoint management: (params, opt state, PRNG key, step) + best-k.

Reference behavior reproduced (``train.py:52``, ``model_base_mix.py:28``):
``ModelCheckpoint(monitor='val/ADE_T', save_top_k, mode='min')``, full
resume, and weights-only warm start (``--wonly``, ``train.py:62-64``).
Storage uses Orbax (the TPU-native checkpoint layer) with a JSON sidecar
for the monitored-metric leaderboard.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        save_top_k: int = 5,
        mode: str = "min",
        keep_last: bool = True,
        async_save: bool = False,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.mode = mode
        # async_save=True overlaps the orbax write with the next epoch's
        # training; the wait moves to the NEXT save (or an explicit
        # ``wait()``).  Emergency preemption saves pass ``wait=True``.
        self.async_save = async_save
        self.keep_last = keep_last
        self._ckptr = ocp.StandardCheckpointer()
        self._board_path = os.path.join(self.directory, "leaderboard.json")
        self._board = self._load_board()
        # an interrupted _prune (rmtree before the board rewrite) can leave
        # entries for deleted directories; drop them so latest()/restore()
        # never picks a checkpoint that is no longer on disk
        live = [e for e in self._board if os.path.exists(e["path"])]
        if len(live) != len(self._board):
            self._board = live
            self._write_board()
        # async saves defer their leaderboard entry here until the orbax
        # write has landed: a crash mid-write can never leave the board
        # pointing at an incomplete directory, and _prune can never rmtree
        # a directory still being written
        self._pending: Optional[dict] = None

    def _load_board(self):
        if os.path.exists(self._board_path):
            with open(self._board_path) as f:
                return json.load(f)
        return []

    def _write_board(self):
        with open(self._board_path, "w") as f:
            json.dump(self._board, f, indent=2)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(
        self, state: Any, metric: Optional[float], step: int, wait: bool = False
    ) -> None:
        path = self._path(step)
        entry = {"step": step, "metric": metric, "path": path}
        # any in-flight async write must land before a new one starts (and
        # before pruning may delete its directory)
        self._flush_pending()
        if os.path.exists(path):
            # re-saving an existing step: either an ORPHAN from a crashed
            # async write (the board entry only lands once the write does)
            # or a rollback-resume re-reaching this step with DIFFERENT
            # weights — in both cases the on-disk state is stale, so
            # replace the directory and any board entry bound to it.
            # Skipping the write would bind this save's metric to weights
            # that never achieved it.
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            if any(e["path"] == path for e in self._board):
                self._board = [e for e in self._board if e["path"] != path]
                self._write_board()
        self._ckptr.save(path, state)
        if wait or not self.async_save:
            self._ckptr.wait_until_finished()
        else:
            self._pending = entry  # board entry lands with the write
            return
        self._board.append(entry)
        self._prune()
        self._write_board()

    def _flush_pending(self) -> None:
        self._ckptr.wait_until_finished()
        if self._pending is not None:
            self._board.append(self._pending)
            self._pending = None
            self._prune()
            self._write_board()

    def wait(self) -> None:
        """Block until any in-flight async save has landed."""
        self._flush_pending()

    def _prune(self) -> None:
        scored = [e for e in self._board if e["metric"] is not None]
        reverse = self.mode == "max"
        scored.sort(key=lambda e: e["metric"], reverse=reverse)
        keep = {e["path"] for e in scored[: self.save_top_k]}
        if self.keep_last and self._board:
            keep.add(self._board[-1]["path"])
        for entry in list(self._board):
            if entry["path"] not in keep:
                self._board.remove(entry)
                if os.path.exists(entry["path"]):
                    import shutil

                    shutil.rmtree(entry["path"], ignore_errors=True)

    def best(self) -> Optional[dict]:
        self._flush_pending()
        scored = [e for e in self._board if e["metric"] is not None]
        if not scored:
            return None
        return (min if self.mode == "min" else max)(scored, key=lambda e: e["metric"])

    def latest(self) -> Optional[dict]:
        self._flush_pending()
        return self._board[-1] if self._board else None

    def restore(self, target: Any, path: Optional[str] = None) -> Any:
        """Full-state restore (``trainer.fit(ckpt_path=...)`` analog)."""
        self._flush_pending()  # async save of this path may be in flight
        if path is None:
            entry = self.latest()
            if entry is None:
                return target
            path = entry["path"]
        return self._ckptr.restore(path, target)

    def restore_params(self, target_params: Any, path: str) -> Any:
        """Weights-only warm start (``--wonly`` analog, ``train.py:62-64``)."""
        self._flush_pending()
        restored = self._ckptr.restore(path)

        def _fit(kpath, t, r):
            r = jax.numpy.asarray(r)
            if tuple(r.shape) != tuple(t.shape):
                name = "/".join(str(getattr(k, "key", k)) for k in kpath)
                raise ValueError(
                    f"checkpoint leaf {name!r} has shape {tuple(r.shape)} but "
                    f"the model expects {tuple(t.shape)} — refusing to "
                    "reinterpret silently (same-size shape mismatches are "
                    "almost always a config/architecture mismatch)"
                )
            return r.astype(t.dtype)

        return jax.tree_util.tree_map_with_path(
            _fit,
            target_params,
            restored["params"] if "params" in restored else restored,
        )
