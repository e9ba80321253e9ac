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
        "broker_detection_ticks": max(
            r.get("detection_ticks", 0) for r in robots),
        "candidates_selected_total": max(
            r.get("candidates_selected_total", 0) for r in robots),
        "candidates_still_pending": max(
            r.get("candidates_known", 0) for r in robots),
        "verification_failures": max(
            r.get("verification_failures", 0) for r in robots),
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
