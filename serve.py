"""Serving CLI: batch-predict a directory of scenes, or run as a daemon.

    # batch mode: one prediction npz per input scene + a latency summary
    python serve.py -c <cfg.yml> --ckpt <step_dir> \
        --input-dir scenes/ --output-dir preds/

    # daemon mode: JSON-lines requests on stdin, responses on stdout
    #   {"id": "r1", "npz": "/path/scene.npz"} -> {"id": "r1", "out": ...}
    echo '{"id": "r1", "npz": "s0.npz"}' | python serve.py -c ... --ckpt ... \
        --output-dir preds/ --daemon

Inputs are preprocessor-output ``.npz`` scene dicts (the shard schema);
the engine applies the same runtime grid alignment as training.  Outputs
per scene: ``loc`` (all-actor agent-frame modes, [K, A, Tf, 2]), ``pi``
(mode logits per actor), ``agent_world`` (focal-agent modes in the scene
frame, [K, Tf, 2] — the submission payload), ``agent_pi`` (softmax mode
probabilities); with ``--ood`` also ``ood_std`` (per-actor OOD scores,
[A]) and ``agent_std`` (the focal scalar, inlined into daemon/HTTP
responses).  The deployment analog the reference lacks (its eval
surface is ``trainer.test`` only, ``/root/reference/test.py:58``; its
OOD scoring runs only offline through that surface).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--input-dir", default=None)
    ap.add_argument("--output-dir", default=None,
                    help="prediction npz output dir (batch/daemon modes)")
    ap.add_argument("--daemon", action="store_true",
                    help="JSON-lines request loop on stdin")
    ap.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve over HTTP (POST /predict with .npz bytes, "
                         "GET /stats, GET /healthz); concurrent requests "
                         "share device dispatches via the micro-batcher")
    ap.add_argument("--host", default="127.0.0.1",
                    help="bind address for --http")
    ap.add_argument("--engine", choices=["auto", "kernel", "scan"], default="auto")
    ap.add_argument("--increments", choices=["rademacher", "gaussian"],
                    default="rademacher")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--num-actors", type=int, default=None)
    ap.add_argument("--num-lanes", type=int, default=None)
    ap.add_argument("--warmup", action="store_true",
                    help="compile every batch bucket before serving")
    ap.add_argument("--ood", action="store_true",
                    help="attach OOD scores to every prediction (per-actor "
                         "embedding stds over the encoder's stochastic "
                         "ensemble; predictions decode from the ensemble "
                         "mean) — the reference's test.py --ood capability, "
                         "served live; costs ~eval_iter x the encoder")
    ap.add_argument("--slim", action="store_true",
                    help="serve only the focal-agent fields (agent_world/"
                         "agent_pi + OOD scores): the jitted pipeline skips "
                         "fetching the dense per-actor grids (~35 MiB -> "
                         "~1 MiB per 128-scene batch) — the recommended "
                         "mode for a daemon under load")
    ap.add_argument("--shard", action="store_true",
                    help="shard each batch bucket over all devices "
                         "(data-parallel serving; scan engine splits "
                         "scenes via GSPMD, kernel engine shard_maps the "
                         "rollout over the flattened B*F*A row axis)")
    ap.add_argument("--export", default=None, metavar="DIR",
                    help="serialize the serving pipeline (StableHLO per "
                         "batch bucket, weights baked in) and exit")
    ap.add_argument("--export-platforms", default=None,
                    help="comma list (e.g. cpu,tpu) for a multi-platform "
                         "artifact; default = current backend")
    ap.add_argument("--from-export", default=None, metavar="DIR",
                    help="serve from an --export artifact: no config, "
                         "checkpoint, or model build needed")
    args = ap.parse_args()
    modes = [args.daemon, args.input_dir is not None, args.http is not None]
    if sum(map(bool, modes)) > 1:
        ap.error("--input-dir, --daemon, and --http are mutually exclusive")
    if not any(modes) and args.export is None:
        ap.error("one of --input-dir, --daemon, --http, or --export is required")
    if args.output_dir is None and args.http is None and any(modes[:2]):
        ap.error("--output-dir is required in batch/daemon modes")
    if args.from_export is None and (args.config is None or args.ckpt is None):
        ap.error("-c/--config and --ckpt are required unless --from-export")
    if args.from_export and args.export:
        ap.error("--export needs the real model; it cannot re-export an artifact")
    if args.from_export and args.shard:
        ap.error("--shard cannot partition an export artifact (an opaque "
                 "StableHLO call); use the scan or kernel engines")
    if args.ood and (args.from_export or args.export):
        ap.error("--ood needs the live model (the OOD ensemble is not part "
                 "of an exported pipeline)")
    if args.slim and (args.from_export or args.export):
        ap.error("--slim cannot shrink an exported pipeline's outputs "
                 "(the StableHLO artifact is frozen with the full result "
                 "set); use the scan or kernel engines")

    if os.environ.get("TRAJSDE_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from trajsde_tpu.config import build_model, load_config
    from trajsde_tpu.data.loader import load_scene_npz
    from trajsde_tpu.data.pack import pack_scenes
    from trajsde_tpu.server import ServingEngine, align_scene
    from trajsde_tpu.train.checkpoint import CheckpointManager

    def load_raw(path: str) -> dict:
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return load_scene_npz(path)

    if args.input_dir:
        paths = sorted(glob.glob(os.path.join(args.input_dir, "*.npz")))
        if not paths:
            raise SystemExit(f"no .npz scenes under {args.input_dir}")
        example_raw = load_raw(paths[0])
    elif args.daemon:
        first_line = sys.stdin.readline()
        if not first_line.strip():
            raise SystemExit("daemon mode: no request on stdin")
        first_req = json.loads(first_line)
        example_raw = load_raw(first_req["npz"])
    else:  # --http / --export-only: a synthetic scene fixes the template shapes
        from trajsde_tpu.data.synthetic import make_raw_scene

        example_raw = make_raw_scene(
            np.random.default_rng(0), 0, num_actors=4, num_lanes=4
        )

    if args.from_export:
        engine = ServingEngine.from_export(
            args.from_export,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        )
    else:
        cfg = load_config(args.config)
        dm = cfg.datamodule
        num_actors = args.num_actors or int(dm.get("num_actors", 48))
        num_lanes = args.num_lanes or int(dm.get("num_lanes", 192))
        is_gtabs = (dm.get("test_dataset_args") or {}).get("is_gtabs", True)
        ref_time = int(cfg.model_kwargs.get("ref_time", 20))

        model = build_model(cfg)

        # params template from one example scene (weights-only restore) —
        # through the SAME alignment path the engine feeds the model
        example = pack_scenes(
            [align_scene(example_raw, is_gtabs)[0]], num_actors, num_lanes
        )
        template = jax.jit(model.init)(
            {"params": jax.random.key(0), "sde": jax.random.key(1)}, example
        )["params"]
        params = CheckpointManager(
            os.path.dirname(os.path.abspath(args.ckpt))
        ).restore_params(template, args.ckpt)

        engine = ServingEngine(
            model, params,
            num_actors=num_actors, num_lanes=num_lanes,
            engine=args.engine, increments=args.increments,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            is_gtabs=is_gtabs, ref_time=ref_time,
            shard=args.shard, ood=args.ood, slim=args.slim,
        )

    if args.export:
        from trajsde_tpu.deploy import export_serving

        manifest = export_serving(
            model, params, example, args.export,
            buckets=engine.buckets, is_gtabs=is_gtabs, ref_time=ref_time,
            platforms=(args.export_platforms.split(",")
                       if args.export_platforms else None),
        )
        engine.close()
        print(json.dumps({"exported": os.path.abspath(args.export),
                          "buckets": manifest["buckets"],
                          "platforms": manifest["platforms"]}))
        return

    if args.http is not None:
        from trajsde_tpu.httpd import run_http_server

        if args.warmup:
            engine.warmup(example_raw)
        import threading

        server, port = run_http_server(engine, args.host, args.http)
        print(json.dumps({"http": f"{args.host}:{port}"}), flush=True)
        try:
            threading.Event().wait()  # serve until interrupted
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
            stats = engine.stats()
            engine.close()
            print(json.dumps(stats))
        return

    os.makedirs(args.output_dir, exist_ok=True)
    if args.warmup:
        engine.warmup(example_raw)

    def write(result: dict, stem: str) -> str:
        # --slim results carry no per-actor loc/pi grids: dump whatever
        # fields the engine produced (agent_world/agent_pi/seq_id always)
        out_path = os.path.join(args.output_dir, f"{stem}_pred.npz")
        np.savez(out_path, **result)
        return out_path

    if args.daemon:
        import queue as _q
        import threading

        # responses are flushed by a dedicated writer thread the moment
        # each future lands — the request loop must NOT gate flushing on
        # the next stdin line (a request/response client would deadlock:
        # it waits for the reply, the server waits for the next line).
        # Output stems include the request id: daemon requests may name
        # same-basename scenes from different directories.
        out_q: "_q.Queue" = _q.Queue()

        def writer():
            while True:
                item = out_q.get()
                if item is None:
                    return
                rid, path, fut = item
                stem = os.path.splitext(os.path.basename(path))[0]
                try:
                    result = fut.result()
                    resp = {"id": rid, "out": write(result, f"{stem}_{rid}")}
                    if "agent_std" in result:  # --ood: inline the focal score
                        resp["agent_std"] = float(result["agent_std"])
                    print(json.dumps(resp), flush=True)
                except Exception as e:
                    print(json.dumps({"id": rid, "error": repr(e)}), flush=True)

        wt = threading.Thread(target=writer)
        wt.start()

        def raw_lines():
            yield json.dumps(first_req)
            yield from sys.stdin

        # a malformed request answers with an error object and the daemon
        # keeps serving — it must not kill the process and strand pending
        # responses
        for line in raw_lines():
            if not line.strip():
                continue
            rid = None
            try:
                req = json.loads(line)
                rid = req.get("id")
                fut = engine.submit(load_raw(req["npz"]))
            except Exception as e:
                print(json.dumps({"id": rid, "error": repr(e)}), flush=True)
                continue
            out_q.put((rid, req["npz"], fut))
        out_q.put(None)
        wt.join()
    else:
        from collections import deque

        # bound in-flight submissions: loading + aligning the whole input
        # directory up front would hold every scene in memory and delay
        # the first write by O(dataset)
        window = max(1, engine.max_batch) * 4
        pending = deque()

        def drain_one():
            p, f = pending.popleft()
            write(f.result(), os.path.splitext(os.path.basename(p))[0])

        for p in paths:
            pending.append((p, engine.submit(load_raw(p))))
            if len(pending) >= window:
                drain_one()
        while pending:
            drain_one()
    stats = engine.stats()
    engine.close()
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
