"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N->4N executor comparison needs a cluster; the sandbox proxy (per the
round brief) is the same job at two parallelism levels on the same input:
local[8] vs local[32]. Runs the flagship image pipeline (tiler + pyramid +
PIP join) at both levels in fresh JVMs, computes

    efficiency = (throughput_32 / throughput_8) / (32 / 8)

and rewrites the "Measured scaling" section of BENCH.md.

Usage: python tools/scaling_bench.py [n_images]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES = (8, 32)


def run_flagship(cores: int, n_images: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        BENCH_IMAGES=str(n_images),
        BENCH_QUERIES="",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        stdout=subprocess.PIPE,
        stderr=None,  # phase logs stream through
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 600000
    results = {}
    for cores in CORES:
        r = run_flagship(cores, n_images)
        results[cores] = r
        print(f"local[{cores}]: {r['flagship']}", flush=True)

    t8 = results[8]["flagship"]["rows_per_sec"]
    t32 = results[32]["flagship"]["rows_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    report = {
        "n_images": n_images,
        "throughput_local8_rows_per_sec": t8,
        "throughput_local32_rows_per_sec": t32,
        "speedup_8_to_32": round(t32 / t8, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "flagship_local8": results[8]["flagship"],
        "flagship_local32": results[32]["flagship"],
    }
    print(json.dumps(report))

    md = f"""# BENCH — measured throughput & scaling

Flagship pipeline (BASELINE.json metric): distributed synth of the
image+caption corpus -> `tile_to_layout` at zoom 6 -> 4-level pyramid ->
PIP spatial join against 1003 polygons. Metric = (tiles + pyramid tiles +
join rows) / wall seconds.

## Measured scaling (N vs 4N proxy: local[8] vs local[32], same input)

| config | images | total rows | sec | rows/sec |
|---|---|---|---|---|
| local[8]  | {n_images} | {results[8]['flagship']['total_rows']} | {results[8]['flagship']['sec']} | {t8} |
| local[32] | {n_images} | {results[32]['flagship']['total_rows']} | {results[32]['flagship']['sec']} | {t32} |

**Speedup 8->32 cores: {round(t32 / t8, 3)}x; scaling efficiency
(speedup / 4): {round(eff, 3)}** (north-rule target: >= 0.8).

The sandbox has no multi-executor cluster; per the round brief this
two-parallelism run on identical input is the evidence proxy for the
N->4N executor criterion. The job's only driver-side steps are polygon
cover enumeration and zoom-loop control; everything else (decode,
tiling, merge, pyramid, join, refine) is partition-parallel, which is
what the efficiency number exercises.

Per-query timings land in the driver's BENCH_r{{N}}.json (bench.py output).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
