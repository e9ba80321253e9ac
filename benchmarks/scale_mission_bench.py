#!/usr/bin/env python
"""Map-scale live mission: the production map-scale code paths under
the FULL protocol (round-4 verdict item 3).

Every prior live mission ran tens of keyframes per robot; the map-scale
solvers (matfree MAC in the broker tick, PCG/chordal PGO at thousands
of poses) had only ever run as isolated bench programs. This mission
drives >= SIM_POSES keyframes/robot x N robots through the real swarm
stack — C++ TCP bus, gossip, election, budgeted detection, geometric
verification, decentralized GNC-LM — and records what the round-4
retrace trap taught us to watch: broker tick latencies (bounded?),
per-optimization wall times at growing graph sizes, verified LCs, and
the end-to-end ATE win.

    python benchmarks/scale_mission_bench.py [--robots 4]
        [--sim-poses 1000] [--duration 420] [--kf-period 0.15]

Writes benchmarks/SCALE_MISSION.json.
"""

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pctl(vals, q):
    vals = sorted(vals)
    return vals[min(int(len(vals) * q), len(vals) - 1)] if vals else None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--robots", type=int, default=4)
    ap.add_argument("--sim-poses", type=int, default=1000)
    ap.add_argument("--duration", type=float, default=420.0)
    ap.add_argument("--kf-period", type=float, default=0.15)
    ap.add_argument("--base-port", type=int, default=19920)
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "SCALE_MISSION.json"))
    args = ap.parse_args(argv)

    out_dir = tempfile.mkdtemp(prefix="scale_mission_")
    cmd = [
        sys.executable, "-u", "-m", "cslam_tpu.launch",
        "--robots", str(args.robots), "--duration", str(args.duration),
        "--sim", "--sim-poses", str(args.sim_poses),
        "--sim-kf-period", str(args.kf_period),
        "--base-port", str(args.base_port), "--json-out", out_dir,
    ]
    print(f"running {args.robots}x{args.sim_poses}-keyframe mission "
          f"({args.duration:.0f}s)...", file=sys.stderr, flush=True)
    t0 = time.monotonic()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=args.duration + 600)
    wall = time.monotonic() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"launch failed:\n{proc.stdout[-3000:]}\n"
                           f"{proc.stderr[-3000:]}")
    robots = []
    for path in sorted(glob.glob(os.path.join(out_dir, "robot*.json"))):
        with open(path) as f:
            robots.append(json.load(f))
    assert len(robots) == args.robots

    # ---- aggregate ----
    det = [r["tick_latency"]["detection"] for r in robots
           if r["tick_latency"]["detection"]["count"]]
    opt_walls = []
    for r in robots:
        opt_walls.extend(r.get("optimization_walls") or [])
    kf = [r["keyframes"] for r in robots]
    ates_o = [r.get("ate_odometry_m") for r in robots]
    ates_p = [r.get("ate_optimized_m") for r in robots]
    mean = lambda v: (sum(x for x in v if x is not None) /
                      max(sum(1 for x in v if x is not None), 1))
    broker = max(robots, key=lambda r: r.get("detection_ticks", 0))
    result = {
        "n_robots": args.robots,
        "sim_poses": args.sim_poses,
        "kf_period_s": args.kf_period,
        "duration_s": args.duration,
        "wall_s": wall,
        "keyframes_per_robot": kf,
        "total_keyframes": sum(kf),
        "verified_loop_closures": max(
            r["verified_loop_closures"] for r in robots),
        "verification_failures": max(
            r.get("verification_failures", 0) for r in robots),
        "broker_detection_ticks": sum(
            r.get("detection_ticks", 0) for r in robots),
        "broker_phase_ms": broker.get("detection_phase_ms"),
        "detection_tick_mean_ms": mean([d["mean_ms"] for d in det]),
        "detection_tick_max_ms": max(d["max_ms"] for d in det),
        # detection ticks > 5 s with the candidate/fixed pool sizes at
        # that moment: outliers at pow2 bucket-crossing sizes are cold
        # XLA compiles (absorbed by the persistent cache on revisits),
        # not recurring solve cost
        "slow_detection_ticks": sum(
            (r.get("slow_detection_ticks") or [] for r in robots), []),
        "candidates_selected_total": sum(
            r.get("candidates_selected_total", 0) for r in robots),
        "candidates_still_pending": max(
            r.get("candidates_known", 0) for r in robots),
        "optimizations": max(r["optimizations"] for r in robots),
        "optimization_walls_s": {
            "count": len(opt_walls),
            "median": pctl([o["wall_s"] for o in opt_walls], 0.5),
            "p90": pctl([o["wall_s"] for o in opt_walls], 0.9),
            "max": max((o["wall_s"] for o in opt_walls), default=None),
            "largest_graph_factors": max(
                (o["n_factors"] for o in opt_walls), default=None),
            "per_solve": opt_walls,
        },
        "comm_tx_bytes_total": sum(r["comm_tx_bytes"] for r in robots),
        "ate_odometry_m": mean(ates_o),
        "ate_optimized_m": mean(ates_p),
        "ate_improvement": (mean(ates_o) / mean(ates_p))
        if mean(ates_p) else None,
        "host": "single 4-core host, one OS process per robot, "
                "C++ TCP bus, CPU JAX (chip-side kernel numbers are "
                "bench.py's job)",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "optimization_walls_s"} |
                     {"opt_walls": {k: v for k, v in
                                    result["optimization_walls_s"].items()
                                    if k != "per_solve"}}, indent=1))


if __name__ == "__main__":
    main()
