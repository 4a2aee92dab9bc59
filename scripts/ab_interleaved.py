"""Interleaved A/B measurement driver (round-5 VERDICT item 7).

The relay-attached TPU's throughput swings up to 6x between runs
(contention windows), so single-leg comparisons lie.  This driver runs
each arm as its OWN subprocess (matching CLAUDE.md's "interleave A/B
across processes" rule), round-robin for N rounds, parses the one JSON
line each leg prints, and reports per-arm n/median/best/min.

Arms are named subprocess argv suffixes appended to a base command:

    python scripts/ab_interleaved.py --rounds 8 \
        --base "scripts/fit_throughput.py --epochs 8 --epoch-block 8" \
        --arm plain= --arm es=--early-stopping \
        --key steady_state_img_per_sec

Every leg inherits the persistent XLA cache, so only the first round
pays compiles; a warm-up round can be discarded with --discard-first.
"""
import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parents[1]


def run_leg(base_argv, arm_argv):
    argv = [sys.executable, *base_argv, *arm_argv]
    proc = subprocess.run(
        argv, capture_output=True, text=True, cwd=REPO, timeout=7200,
    )
    out = proc.stdout.strip().splitlines()
    for line in reversed(out):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), proc
            except json.JSONDecodeError:
                continue
    return None, proc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--base", required=True,
                    help="base command (script + shared args), shell-split")
    ap.add_argument("--arm", action="append", required=True,
                    help="NAME=extra args (shell-split; empty for none)")
    ap.add_argument("--key", required=True,
                    help="JSON field to collect from each leg")
    ap.add_argument("--discard-first", action="store_true",
                    help="run one warm-up round first and drop it")
    args = ap.parse_args()

    base_argv = args.base.split()
    arms = []
    for spec in args.arm:
        name, _, extra = spec.partition("=")
        arms.append((name, extra.split() if extra else []))

    results = {name: [] for name, _ in arms}
    rounds = args.rounds + (1 if args.discard_first else 0)
    for rnd in range(rounds):
        for name, extra in arms:
            payload, proc = run_leg(base_argv, extra)
            if payload is None or args.key not in payload:
                print(f"round {rnd} {name}: LEG FAILED (rc={proc.returncode})",
                      file=sys.stderr, flush=True)
                print(proc.stdout[-800:], file=sys.stderr)
                print(proc.stderr[-800:], file=sys.stderr)
                continue
            val = float(payload[args.key])
            keep = not (args.discard_first and rnd == 0)
            if keep:
                results[name].append(val)
            print(f"round {rnd} {name}: {val:.1f}"
                  f"{' (warm-up, discarded)' if not keep else ''}",
                  flush=True)

    summary = {}
    for name, vals in results.items():
        if not vals:
            summary[name] = {"n": 0}
            continue
        v = sorted(vals)
        summary[name] = {
            "n": len(v),
            "median": float(np.median(v)),
            "best": v[-1],
            "min": v[0],
        }
    names = [n for n, _ in arms]
    if len(names) == 2 and all(summary[n].get("n") for n in names):
        a, b = names
        summary["ratio_median"] = round(
            summary[a]["median"] / summary[b]["median"], 4
        )
        summary["ratio_best"] = round(
            summary[a]["best"] / summary[b]["best"], 4
        )
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
