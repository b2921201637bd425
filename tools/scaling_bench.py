"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N->4N executor comparison needs a cluster; the sandbox proxy (per the
round brief) is the same job at two parallelism levels on the same input:
local[8] vs local[32]. Runs the flagship image pipeline (tiler + pyramid +
PIP join) at both levels in fresh JVMs and computes

    efficiency = (throughput_32 / throughput_8) / (32 / 8)

It also CALIBRATES the hardware ceiling: the same 8-vs-32-way comparison for
bare zlib+NumPy tile work with no Spark at all (multiprocessing only). On a
shared-memory single box, 32 cores do not bring 4x the memory bandwidth of
8 cores — on a real cluster, 4N executors do (each node adds DRAM + disks).
The normalized efficiency (pipeline / ceiling) isolates what the ENGINE
loses, which is the thing the north rule's >=0.8 bar is probing.

Usage: python tools/scaling_bench.py [n_images]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES = (8, 32)


def _tile_work(n: int) -> int:
    """One core's share of bare tile codec work (encode+decode+f64 cast)."""
    import zlib

    import numpy as np

    a = (np.arange(256 * 256, dtype=np.uint8).reshape(256, 256) * 3)
    acc = 0
    for i in range(n):
        b = zlib.compress((a + (i % 7)).tobytes(), 1)
        c = np.frombuffer(zlib.decompress(b), dtype=np.uint8)
        acc += int(c.astype(np.float64)[0])
    return acc


def hardware_ceiling(per: int = 2500) -> dict:
    """8-vs-32-process speedup for pure tile-codec work — the box's own
    scaling limit (memory bandwidth / SMT), independent of Spark. Pool
    warmup + best-of-2 so fork/startup noise doesn't contaminate the
    short measurement."""

    def bench(procs: int, n: int) -> float:
        with mp.Pool(procs) as p:
            p.map(_tile_work, [5] * procs)  # warmup
            best = 0.0
            for _ in range(2):
                t0 = time.time()
                p.map(_tile_work, [n] * procs)
                best = max(best, procs * n / (time.time() - t0))
        return best

    r8 = bench(8, per * 4)  # equal total work at both widths
    r32 = bench(32, per)
    return {
        "ops_per_sec_8p": round(r8),
        "ops_per_sec_32p": round(r32),
        "speedup": round(r32 / r8, 3),
        "efficiency": round((r32 / r8) / 4, 3),
    }


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
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 1600000
    ceiling = hardware_ceiling()
    print(f"hardware ceiling (bare zlib+numpy, no Spark): {ceiling}", flush=True)
    results = {}
    for cores in CORES:
        r = run_flagship(cores, n_images)
        results[cores] = r
        print(f"local[{cores}]: {r['flagship']}", flush=True)

    t8 = results[8]["flagship"]["rows_per_sec"]
    t32 = results[32]["flagship"]["rows_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    norm = min(1.0, eff / ceiling["efficiency"]) if ceiling["efficiency"] else None
    report = {
        "n_images": n_images,
        "throughput_local8_rows_per_sec": t8,
        "throughput_local32_rows_per_sec": t32,
        "speedup_8_to_32": round(t32 / t8, 3),
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling": ceiling,
        "normalized_efficiency": round(norm, 3) if norm else None,
        "target": 0.8,
        "flagship_local8": results[8]["flagship"],
        "flagship_local32": results[32]["flagship"],
    }
    print(json.dumps(report))

    f8, f32 = results[8]["flagship"], results[32]["flagship"]
    md = f"""# BENCH — measured throughput & scaling

Flagship pipeline (BASELINE.json metric): scan the stored image+caption
corpus (parquet) -> `tile_to_layout` at zoom 6 (skew-salted two-phase
merge) -> 4-level pyramid -> PIP spatial join against 1003 polygons.
Metric = (tiles + pyramid tiles + join rows) / wall seconds; the corpus has
the fixtures' 10% hot-cell skew baked in.

## Measured scaling (N vs 4N proxy: local[8] vs local[32], same input)

| config | images | total rows | sec | rows/sec |
|---|---|---|---|---|
| local[8]  | {n_images} | {f8['total_rows']} | {f8['sec']} | {t8} |
| local[32] | {n_images} | {f32['total_rows']} | {f32['sec']} | {t32} |

Speedup 8->32 cores: **{round(t32 / t8, 3)}x**; raw scaling efficiency
(speedup / 4): **{round(eff, 3)}** (north-rule target >= 0.8 on a real
N->4N cluster).

## Hardware ceiling calibration

The same 8-vs-32-way comparison for bare zlib+NumPy tile codec work with
NO Spark (multiprocessing only) on this box:

| | ops/sec | speedup | efficiency |
|---|---|---|---|
| 8 procs  | {ceiling['ops_per_sec_8p']} | — | — |
| 32 procs | {ceiling['ops_per_sec_32p']} | {ceiling['speedup']}x | {ceiling['efficiency']} |

A single shared-memory box does not give 32 cores 4x the DRAM bandwidth of
8 cores, so ~{ceiling['efficiency']} is the best ANY memory-bound tile
workload can do here; on a real cluster each added node brings its own
DRAM, disks and NICs, which is what the >=0.8 criterion assumes.

**Normalized efficiency (pipeline / hardware ceiling):
{round(norm, 3) if norm else 'n/a'}** — the engine's own scaling loss
(scheduling, shuffle, stragglers, driver work) on top of the hardware
limit. The pipeline's only driver-side steps are the O(hot-keys) census
collect and the zoom-loop control; everything else (decode, compact-part
cut, salted merge, pyramid, join, refine) is partition-parallel.

The sandbox has no multi-executor cluster; per the round brief this
two-parallelism run on identical input is the evidence proxy for the
N->4N executor criterion.

Per-query timings land in the driver's BENCH_r{{N}}.json (bench.py output).
"""
    # replace only the scaling sections; preserve everything after the
    # per-query marker line (triage notes, codec benches, headline tables)
    path = os.path.join(REPO, "BENCH.md")
    marker = "Per-query timings land in the driver's BENCH_r{N}.json (bench.py output).\n"
    tail = ""
    if os.path.exists(path):
        prev = open(path).read()
        if marker in prev:
            tail = prev.split(marker, 1)[1]
    with open(path, "w") as f:
        f.write(md + tail)
    print("wrote BENCH.md (scaling sections replaced, rest preserved)")


if __name__ == "__main__":
    main()
