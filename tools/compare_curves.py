#!/usr/bin/env python
"""Overlay learning curves from this framework against reference mjrl logs.

The north-star acceptance test is "matches mjrl's learning curves within
seed variance" (BASELINE.json); this tool makes that a one-command check the
day a reference log exists (reference log formats: mjrl/utils/logger.py
``DataLog.save_log`` writes log.csv + log.pickle with keys running_score,
stoc_pol_mean, ...; the metric names here are identical by design).

    python tools/compare_curves.py runs/ant_npg_s0 runs/ant_npg_s1 \
        --ref path/to/mjrl_job/logs/log.csv --key running_score \
        --out ant_overlay.png --band

Ours-only mode (no --ref) overlays multiple seeds and prints the
mean +/- std at --at step marks — the multi-seed table generator for
PARITY.md.
"""

from __future__ import annotations

import argparse
import csv
import os
import pickle
import sys

import numpy as np


def load_log(path):
    """Load a log from a job dir, log.csv, or mjrl log.pickle.

    Returns dict key -> np.array (ragged keys end-aligned like DataLog).
    """
    if os.path.isdir(path):
        for cand in ("logs/log.csv", "log.csv", "logs/log.pickle", "log.pickle"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            sys.exit(f"{path}: no log.csv/log.pickle found")
    if path.endswith((".pickle", ".pkl")):
        with open(path, "rb") as f:
            raw = pickle.load(f)
        return {k: np.asarray(v, dtype=float) for k, v in raw.items()}
    out = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            for k, v in row.items():
                out.setdefault(k, [])
                if v not in (None, ""):
                    try:
                        out[k].append(float(v))
                    except ValueError:
                        pass
    return {k: np.asarray(v) for k, v in out.items()}


def steps_axis(log, num_traj=None, horizon=None):
    """Cumulative env-step x-axis with graceful fallbacks.

    Priority: explicit total_env_steps column > cumsum(num_samples) >
    iteration * num_traj * horizon (mjrl logs that track neither).
    """
    if "total_env_steps" in log:
        return log["total_env_steps"]
    if "num_samples" in log:
        return np.cumsum(log["num_samples"])
    n = len(next(iter(log.values())))
    if num_traj and horizon:
        return np.arange(1, n + 1) * float(num_traj) * float(horizon)
    return np.arange(n, dtype=float)  # iterations


def value_at(xs, ys, x):
    """Last logged value at or before step x (NaN if never reached)."""
    idx = np.searchsorted(xs, x, side="right") - 1
    return float(ys[idx]) if idx >= 0 else float("nan")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("ours", nargs="+", help="our job dirs / log files (seeds)")
    p.add_argument("--ref", nargs="*", default=[],
                   help="reference mjrl log.csv/log.pickle files (seeds)")
    p.add_argument("--key", default="running_score")
    p.add_argument("--out", default=None, help="overlay png path")
    p.add_argument("--at", nargs="*", type=float, default=[10e6],
                   help="report value at these env-step marks")
    p.add_argument("--ref-num-traj", type=float, default=None)
    p.add_argument("--ref-horizon", type=float, default=None)
    p.add_argument("--band", action="store_true",
                   help="shade min-max band per side")
    args = p.parse_args()

    sides = [("ours", args.ours, None), ("mjrl", args.ref, "--ref")]
    curves = {}
    for label, paths, _ in sides:
        cs = []
        for path in paths:
            log = load_log(path)
            if args.key not in log:
                sys.exit(f"{path}: key {args.key!r} not in log "
                         f"(has {sorted(log)[:8]}...)")
            kw = {}
            if label == "mjrl":
                kw = dict(num_traj=args.ref_num_traj, horizon=args.ref_horizon)
            xs = steps_axis(log, **kw)
            ys = log[args.key]
            m = min(len(xs), len(ys))
            cs.append((np.asarray(xs[:m]), np.asarray(ys[:m]), path))
        curves[label] = cs

    for mark in args.at:
        for label, cs in curves.items():
            if not cs:
                continue
            vals = np.array([value_at(x, y, mark) for x, y, _ in cs])
            ok = vals[~np.isnan(vals)]
            if len(ok):
                print(f"{args.key} @ {mark:.3g} steps [{label}, n={len(ok)}]: "
                      f"mean {ok.mean():.1f} +/- {ok.std(ddof=1) if len(ok) > 1 else 0.0:.1f} "
                      f"(min {ok.min():.1f}, max {ok.max():.1f})")
    if curves["ours"] and curves["mjrl"]:
        for mark in args.at:
            ov = np.array([value_at(x, y, mark) for x, y, _ in curves["ours"]])
            rv = np.array([value_at(x, y, mark) for x, y, _ in curves["mjrl"]])
            ov, rv = ov[~np.isnan(ov)], rv[~np.isnan(rv)]
            if len(ov) and len(rv):
                lo = rv.min() - (rv.std(ddof=1) if len(rv) > 1 else 0.1 * abs(rv.mean()))
                hi = rv.max() + (rv.std(ddof=1) if len(rv) > 1 else 0.1 * abs(rv.mean()))
                verdict = "WITHIN" if lo <= ov.mean() <= hi else "OUTSIDE"
                print(f"@ {mark:.3g}: ours mean {ov.mean():.1f} is {verdict} "
                      f"mjrl seed band [{lo:.1f}, {hi:.1f}]")

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4.5))
        colors = {"ours": "tab:blue", "mjrl": "tab:orange"}
        for label, cs in curves.items():
            for i, (x, y, path) in enumerate(cs):
                ax.plot(x, y, color=colors[label], alpha=0.8,
                        label=label if i == 0 else None)
            if args.band and len(cs) > 1:
                grid = np.linspace(
                    0, min(x[-1] for x, _, _ in cs), 200
                )
                ys = np.stack([
                    np.interp(grid, x, y) for x, y, _ in cs
                ])
                ax.fill_between(grid, ys.min(0), ys.max(0),
                                color=colors[label], alpha=0.15)
        ax.set_xlabel("env steps (valid transitions)")
        ax.set_ylabel(args.key)
        ax.legend()
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
