#!/usr/bin/env python3
"""Cross-round bench drift adjudication (VERDICT r11 item 2).

Compares two bench_detail_r<N>.json artifacts per query on the
load-insensitive channel (run-1 cpu) next to warm wall, so a wall
regression can be attributed: cpu moved too -> real work change;
cpu flat -> host/scheduler noise riding the documented 1.2-1.7x
identical-code wall spread.

Usage: python3 scripts/benchdiff.py bench_detail_r11.json bench_detail.json [wall_ratio_threshold]
"""
import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    a = json.load(open(a_path))["queries"]
    b = json.load(open(b_path))["queries"]
    shared = sorted(set(a) & set(b))
    print(f"{len(shared)} shared queries "
          f"({len(b) - len(shared)} new, {len(a) - len(shared)} retired)")
    tot_wall = (sum(a[q]["min_sec"] for q in shared),
                sum(b[q]["min_sec"] for q in shared))
    tot_cpu = (sum(a[q]["cpu_ms_r1"] for q in shared) / 1e3,
               sum(b[q]["cpu_ms_r1"] for q in shared) / 1e3)
    print(f"shared-subset wall {tot_wall[0]:.1f} -> {tot_wall[1]:.1f} s "
          f"({tot_wall[1] / tot_wall[0]:.2f}x), "
          f"cpu_r1 {tot_cpu[0]:.1f} -> {tot_cpu[1]:.1f} s "
          f"({tot_cpu[1] / tot_cpu[0]:.2f}x)")
    print(f"\nwall movers >= {thresh}x (or >= 1/{thresh}x improvements), "
          "with the cpu channel for attribution:")
    print(f"{'query':42s} {'wall A':>7s} {'wall B':>7s} {'ratio':>6s} "
          f"{'cpuA_r1':>8s} {'cpuB_r1':>8s} {'cpu_ratio':>9s}")
    for q in shared:
        wa, wb = a[q]["min_sec"], b[q]["min_sec"]
        ca, cb = a[q]["cpu_ms_r1"] / 1e3, b[q]["cpu_ms_r1"] / 1e3
        if wa <= 0 or wb <= 0:
            continue
        r = wb / wa
        if r >= thresh or r <= 1 / thresh:
            cr = cb / ca if ca > 0 else float("inf")
            print(f"{q:42s} {wa:7.2f} {wb:7.2f} {r:6.2f} "
                  f"{ca:8.2f} {cb:8.2f} {cr:9.2f}")


if __name__ == "__main__":
    main()
