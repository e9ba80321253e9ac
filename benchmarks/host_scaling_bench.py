#!/usr/bin/env python
"""Measured host-protocol scaling: real OS processes over the TCP bus.

Runs full swarm missions (python -m cslam_tpu.launch --sim) at 2, 4 and
8 robot processes on this host — real C++ TCP bus, per-process JAX —
and records per scale: verified loop closures, gossip/comm bytes,
election-to-first-optimization latency, detection-round latency, and
mission ATE. This is the measurable half of the >=0.8-efficiency-at-4-
hosts BASELINE target that a single TPU chip cannot address (the
protocol layer is host-side; the chip-side math is bench.py's job).
The same launch command distributes across machines via --hosts, so
these numbers are the single-host floor of the multi-host deployment.

    python benchmarks/host_scaling_bench.py [--scales 2,4,8]
                                            [--duration 40]

Writes benchmarks/HOST_SCALING.json.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def verification_breakdown(robots):
    """Classify verification failures from the sim's ground-truth log
    (SCALING.md §5, round-4 verdict item 5): each failure's TRUE
    distance tells whether it was a near-miss of the geometric gate
    (threshold artifact) or genuine non-overlap (robots far apart —
    selection should have known better), and the broker's recorded
    candidate weights tell whether descriptor similarity separates the
    two populations (i.e. whether a selection-side floor can help)."""
    logs = []
    gate = None
    for r in robots:
        logs.extend(r.get("sim_verification_log") or [])
        gate = r.get("sim_verification_gate_m", gate)
    out = {"n_verifications": len(logs)}
    if not logs or gate is None:
        return out
    fails = [v for v in logs if not v["success"]]
    succs = [v for v in logs if v["success"]]
    out["n_failed"] = len(fails)
    out["fail_rate"] = len(fails) / len(logs)
    out["gate_m"] = gate
    # unique PAIRS (a pair can be verified twice when both endpoints
    # land in the vertex cover via other edges)
    pair = lambda v: (v["r0"], v["k0"], v["r1"], v["k1"])
    uf, us = {pair(v) for v in fails}, {pair(v) for v in succs}
    out["unique_pairs_failed"] = len(uf)
    out["unique_pairs_verified"] = len(us)
    out["unique_fail_rate"] = len(uf) / max(len(uf | us), 1)
    if fails:
        dists = sorted(v["distance"] for v in fails)
        out["failed_distance_median_m"] = dists[len(dists) // 2]
        out["failed_distance_p90_m"] = dists[int(len(dists) * 0.9)]
        out["failed_near_gate_frac"] = sum(
            1 for d in dists if d < 1.5 * gate) / len(dists)
        out["failed_genuine_non_overlap_frac"] = sum(
            1 for d in dists if d >= 2.0 * gate) / len(dists)
        # failures by robot-index separation (circle centers drift
        # apart with |rid0 - rid1| in the synthetic world)
        by_sep = {}
        for v in fails:
            sep = abs(v["r0"] - v["r1"])
            by_sep[sep] = by_sep.get(sep, 0) + 1
        out["failed_by_robot_separation"] = {
            str(k): v for k, v in sorted(by_sep.items())}
    # candidate weights at verification time, from a NON-broker robot:
    # the broker's own candidate table loses entries at selection time,
    # so its outcome-time lookups return None (measured r5)
    non_broker = [r for r in robots if r.get("detection_ticks", 0) == 0]
    weights = max((r.get("verification_outcome_weights") or []
                   for r in (non_broker or robots)), key=len)
    w_fail = [w["weight"] for w in weights
              if not w["success"] and w["weight"] is not None]
    w_succ = [w["weight"] for w in weights
              if w["success"] and w["weight"] is not None]
    if w_fail:
        out["failed_weight_mean"] = sum(w_fail) / len(w_fail)
    if w_succ:
        out["success_weight_mean"] = sum(w_succ) / len(w_succ)
    return out


def run_scale(n_robots, duration, base_port, sim_poses):
    out_dir = tempfile.mkdtemp(prefix=f"host_scaling_{n_robots}_")
    cmd = [
        sys.executable, "-u", "-m", "cslam_tpu.launch",
        "--robots", str(n_robots), "--duration", str(duration),
        "--sim", "--sim-poses", str(sim_poses),
        "--base-port", str(base_port), "--json-out", out_dir,
    ]
    t0 = time.monotonic()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=duration + 240)
    wall = time.monotonic() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"launch failed at {n_robots} robots:\n{proc.stdout[-2000:]}"
            f"\n{proc.stderr[-2000:]}")
    robots = []
    for path in sorted(glob.glob(os.path.join(out_dir, "robot*.json"))):
        with open(path) as f:
            robots.append(json.load(f))
    assert len(robots) == n_robots, (len(robots), n_robots)

    def total(key):
        return sum(r[key] for r in robots)

    def mean(vals):
        vals = [v for v in vals if v is not None]
        return sum(vals) / len(vals) if vals else None

    det = [r["tick_latency"]["detection"] for r in robots]
    ate_odo = mean([r.get("ate_odometry_m") for r in robots])
    ate_opt = mean([r.get("ate_optimized_m") for r in robots])
    return {
        "n_robots": n_robots,
        "duration_s": duration,
        "wall_s": wall,
        "verified_loop_closures": max(
            r["verified_loop_closures"] for r in robots),
        "total_comm_bytes": total("comm_tx_bytes"),
        "gossip_comm_bytes": total("gossip_comm_bytes"),
        "comm_bytes_per_robot_pair": total("comm_tx_bytes") /
        (n_robots * (n_robots - 1)),
        "optimizations": max(r["optimizations"] for r in robots),
        "first_loop_closure_s": mean(
            [r["first_loop_closure_s"] for r in robots]),
        "first_optimization_s": mean(
            [r["first_optimization_s"] for r in robots]),
        "detection_tick_mean_ms": mean([d["mean_ms"] for d in det]),
        "detection_tick_max_ms": max(d["max_ms"] for d in det),
        # broker breakdown: the broker (lowest id in range) pays
        # detection alone — report ITS phase totals and the candidate
        # flow that explains the verified-LC count
        "broker_phase_ms": next(
            (r.get("detection_phase_ms") for r in robots
             if r.get("detection_ticks", 0) > 0), None),
        # SUMMED over robots: brokership can move between robots while
        # the election settles (measured r5: robot 1 ran 13 ticks
        # before robot 0 took over), so a max() undercounts
        "broker_detection_ticks": sum(
            r.get("detection_ticks", 0) for r in robots),
        "candidates_selected_total": sum(
            r.get("candidates_selected_total", 0) for r in robots),
        "candidates_still_pending": max(
            r.get("candidates_known", 0) for r in robots),
        "verification_failures": max(
            r.get("verification_failures", 0) for r in robots),
        "verification_breakdown": verification_breakdown(robots),
        # verified unique pairs per budgeted selection slot — the
        # metric the round-4 verdict asked to raise at 8 robots
        "verification_budget_efficiency": (
            verification_breakdown(robots).get("unique_pairs_verified", 0) /
            max(sum(r.get("candidates_selected_total", 0)
                    for r in robots), 1)),
        "ate_odometry_m": ate_odo,
        "ate_optimized_m": ate_opt,
        "ate_improvement": (ate_odo / ate_opt)
        if ate_odo and ate_opt else None,
        "per_robot": robots,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scales", default="2,4,8")
    ap.add_argument("--duration", type=float, default=40.0)
    ap.add_argument("--sim-poses", type=int, default=24)
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "HOST_SCALING.json"))
    args = ap.parse_args(argv)

    scales = [int(s) for s in args.scales.split(",")]
    results = []
    for i, n in enumerate(scales):
        # larger swarms need longer missions: N processes oversubscribe
        # the host (ticks backlog) and the optimizer's collection round
        # waits on N-1 pose-graph responses
        duration = max(args.duration, 15.0 * n)
        print(f"running {n}-robot mission ({duration:.0f}s)...",
              file=sys.stderr, flush=True)
        r = run_scale(n, duration, base_port=19720 + 40 * i,
                      sim_poses=args.sim_poses)
        results.append(r)
        print(f"  {n} robots: {r['verified_loop_closures']} LCs, "
              f"{r['optimizations']} opts, "
              f"first-opt {r['first_optimization_s']:.1f}s, "
              f"detection tick {r['detection_tick_mean_ms']:.0f}ms, "
              f"ATE x{(r['ate_improvement'] or 0):.2f}, "
              f"comm {r['total_comm_bytes']/1024:.0f}kB",
              file=sys.stderr, flush=True)

    out = {
        "host": "single host, one OS process per robot, C++ TCP bus",
        "note": "protocol-layer scaling (detection latency, election "
                "convergence, comm volume); chip-side kernel scaling "
                "is bench.py / SCALING.json",
        "scales": [{k: v for k, v in r.items() if k != "per_robot"}
                   for r in results],
        "per_robot_detail": {str(r["n_robots"]): r["per_robot"]
                             for r in results},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["scales"]))


if __name__ == "__main__":
    main()
