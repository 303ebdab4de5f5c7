"""Convert a reference (daeheepark/TrajSDE) Lightning checkpoint to a
native checkpoint usable by ``train.py --wonly`` and ``test.py --ckpt``.

    python scripts/convert_checkpoint.py -c <config.yml> \
        --torch-ckpt <lightning.ckpt> --out <dir>

The config must be the experiment YAML the checkpoint was trained with
(the same file drops into both stacks — MIGRATION.md).  The output is an
orbax directory holding ``{"params": <flax tree>}``; optimizer state and
step counters are NOT carried over (Lightning's AdamW moments don't map
onto optax's tree layout), so resume it as a warm start, not mid-run.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if os.environ.get("TRAJSDE_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    import jax
    import orbax.checkpoint as ocp

    from trajsde_tpu.config import build_model, load_config
    from trajsde_tpu.data.synthetic import make_scene_batch
    from trajsde_tpu.utils.convert import convert_state_dict

    if not os.path.exists(args.torch_ckpt):
        raise FileNotFoundError(args.torch_ckpt)
    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    def to_np(v):
        if hasattr(v, "detach"):  # torch tensor; bf16 has no numpy() path
            v = v.detach()
            if v.dtype == torch.bfloat16:
                v = v.float()
            return v.cpu().numpy()
        return np.asarray(v)

    sd = {k: to_np(v) for k, v in sd.items()}

    cfg = load_config(args.config)
    model = build_model(cfg)
    scene = make_scene_batch(np.random.default_rng(0), batch_size=1,
                             num_actors=4, num_lanes=6)
    template = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )["params"]

    params, report = convert_state_dict(sd, cfg, template)

    out = os.path.abspath(args.out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, {"params": jax.device_get(params)})
    ckptr.wait_until_finished()  # StandardCheckpointer writes asynchronously
    n = len(jax.tree_util.tree_leaves(params))
    print(json.dumps({
        "out": out,
        "converted_leaves": n,
        "skipped_dead": report["skipped"],
        "unused_keys": report["unused"],
    }))
    if report["unused"]:
        print(
            f"warning: {len(report['unused'])} unrecognized checkpoint keys "
            "were ignored (see unused_keys above)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
