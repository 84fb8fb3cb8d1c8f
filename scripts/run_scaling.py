"""Standalone scaling-sweep runner (same measurement as bench.py main's
ppr_scaling section).  Usage:
  SPARK_GRAFT_BENCH_EDGES=4e8 python scripts/run_scaling.py [sweeps] [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else bench.SCALING_SWEEPS
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    blocks = bench.ensure_blocks(
        f"e{bench.BENCH_EDGES}_n{bench.BENCH_NODES}_b{bench.N_BLOCKS}_v2")
    out = bench.measure_levels(blocks, sweeps=sweeps)
    js = json.dumps(out, indent=1)
    print(js)
    if out_path:
        with open(out_path, "w") as f:
            f.write(js)


if __name__ == "__main__":
    main()
