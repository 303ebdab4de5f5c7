"""Aggregate the tier-4 parity campaigns into one statistical verdict.

Each ``PARITY_TRAIN*.json`` campaign is a PAIRED comparison: both stacks
train from the same transplanted init on the same dataset for the same
number of steps, and each stack contributes two independent final draws
(the main run + its noise replica — same init, different Brownian/dropout
seeds).  Pairing makes campaigns with different step counts directly
combinable: the statistic is the per-campaign relative gap between the
two stacks' mean finals, and the estimate is the across-campaign mean of
those signed gaps with its standard error.

This converts "each seed's delta is inside the noise band" (a per-draw
statement) into "the MEAN cross-stack gap is consistent with zero at the
±1% level" (the north-star statement, BASELINE.md).

Usage: python scripts/parity_aggregate.py [--glob 'PARITY_TRAIN*.json']
"""
import argparse
import glob
import json
import math
import os


def campaign_gaps(path):
    d = json.load(open(path))
    fin = d["history"][-1]
    rep = d.get("noise_replica_final") or {}
    draws = {"jax": [fin["jax"]], "torch_ref": [fin["torch_ref"]]}
    for stack in ("jax", "torch_ref"):
        if stack in rep:
            draws[stack].append(rep[stack])
    out = {
        "file": os.path.basename(path),
        "steps": d["config"]["steps"],
        # early campaigns predate the explicit seed key; they ran seed 0
        "seed": d["config"].get("seed", 0),
        "dims": "D{D}A{A}TH{TH}TF{TF}".format(**{
            k: d["config"].get(k, "?") for k in ("D", "A", "TH", "TF")
        }),
    }
    for metric in ("minADE", "minFDE"):
        means = {
            s: sum(x[metric] for x in draws[s]) / len(draws[s]) for s in draws
        }
        out[metric] = {
            "jax_mean": means["jax"],
            "ref_mean": means["torch_ref"],
            # signed: + means the repo is WORSE (higher error) than the ref
            "rel_gap": (means["jax"] - means["torch_ref"]) / means["torch_ref"],
            "n_draws": min(len(draws["jax"]), len(draws["torch_ref"])),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="PARITY_TRAIN*.json")
    ap.add_argument("--out", default=None, help="write the aggregate JSON here")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(root, args.glob)))
    # The default glob also matches this script's own output
    # (PARITY_TRAIN_aggregate.json) and any other non-campaign files;
    # campaigns are identified by their 'history' key.
    rows = []
    for p in paths:
        if args.out and os.path.basename(p) == os.path.basename(args.out):
            continue
        d = json.load(open(p))
        if "history" not in d:
            print(f"[skip] {os.path.basename(p)}: no 'history' key (not a campaign)")
            continue
        rows.append(campaign_gaps(p))
    if not rows:
        raise SystemExit(f"no campaign files match {args.glob}")

    print("| campaign | steps | repo minADE | ref minADE | gap | repo minFDE | ref minFDE | gap |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        a, f = r["minADE"], r["minFDE"]
        print(
            f"| {r['file']} | {r['steps']} | {a['jax_mean']:.4f} | "
            f"{a['ref_mean']:.4f} | {a['rel_gap']:+.1%} | {f['jax_mean']:.4f} | "
            f"{f['ref_mean']:.4f} | {f['rel_gap']:+.1%} |"
        )

    summary = {"n_campaigns": len(rows), "campaigns": rows}
    # Campaigns sharing a (seed, dims) configuration are NOT independent
    # draws (same init, same dataset — e.g. the 240- and 600-step seed-0
    # runs differ only in step count and their gaps are nearly identical),
    # so collapse each (seed, dims-signature) group to its mean gap before
    # computing the across-campaign standard error.
    def group_key(r):
        return (r["seed"], r["dims"])

    for metric in ("minADE", "minFDE"):
        groups = {}
        for r in rows:
            groups.setdefault(group_key(r), []).append(r[metric]["rel_gap"])
        gaps = [sum(g) / len(g) for g in groups.values()]
        n = len(gaps)
        mean = sum(gaps) / n
        var = sum((g - mean) ** 2 for g in gaps) / (n - 1) if n > 1 else float("nan")
        se = math.sqrt(var / n) if n > 1 else float("nan")
        summary[metric] = {
            "mean_rel_gap": mean,
            "se": se,
            "gaps": gaps,
            "n_independent_groups": n,
        }
        print(
            f"\n{metric}: mean signed cross-stack gap over {n} independent "
            f"(seed, dims) groups ({len(rows)} campaigns) "
            f"= {mean:+.2%} ± {se:.2%} (s.e.)"
            + ("  → consistent with zero" if abs(mean) <= 2 * se else "")
        )

    if args.out:
        with open(os.path.join(root, args.out), "w") as fh:
            json.dump(summary, fh, indent=1)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
