"""Windowed GeoTiff read micro-benchmark — the engine-side mirror of the
reference's WindowedGeoTiffReader demo (docs/raster/
WindowedGeoTiffReaderDemo.md), which is the only published performance
table the reference ships (BASELINE.md). Same protocol: read a centered
window covering N% of the file's area via the windowed reader (WGR) vs
decoding everything and cropping; Byte and Float64 band types; a "small"
file read both ways and a "large" file windowed-only.

Usage: python tools/tiff_bench.py  (prints a markdown table; ~1 min)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tilegrid.geotiff import tiff_decode, tiff_decode_window, tiff_encode  # noqa: E402

SMALL = 2048        # 2048x2048: 4 MiB Byte / 32 MiB Float64
LARGE = 16384       # 16384x16384 Byte (256 MiB); Float64 uses 8192 (512 MiB)
RPS = 64            # rows per strip


def build(n: int, dtype) -> tuple[np.ndarray, bytes]:
    rng = np.random.RandomState(7)
    if np.dtype(dtype) == np.uint8:
        a = rng.randint(0, 255, (n, n)).astype(np.uint8)
    else:
        a = rng.uniform(0.0, 1000.0, (n, n)).astype(dtype)
    return a, tiff_encode(a, compress=False, rows_per_strip=RPS)


def centered(n: int, pct: float) -> tuple[int, int, int, int]:
    side = max(1, int(n * (pct ** 0.5)))
    off = (n - side) // 2
    return off, off, side, side


def t_ms(fn, reps: int = 5) -> float:
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(best))


def main() -> None:
    print("| file | band | % | WGR ms | read-all+crop ms | speedup |")
    print("|---|---|---|---|---|---|")
    for name, dtype in (("Byte", np.uint8), ("Float64", np.float64)):
        a, data = build(SMALL, dtype)
        for pct in (0.05, 0.10, 0.15, 0.90, 0.95, 1.00):
            x0, y0, ww, wh = centered(SMALL, pct)
            wgr = t_ms(lambda: tiff_decode_window(data, x0, y0, ww, wh))
            crop = t_ms(lambda: tiff_decode(data)[0][y0:y0 + wh, x0:x0 + ww])
            print(f"| small {SMALL}^2 | {name} | {int(pct*100)}% "
                  f"| {wgr:.2f} | {crop:.2f} | {crop/wgr:.1f}x |")
    for name, dtype, n in (("Byte", np.uint8, LARGE),
                           ("Float64", np.float64, LARGE // 2)):
        a, data = build(n, dtype)
        for pct in (0.05, 0.10, 0.15):
            x0, y0, ww, wh = centered(n, pct)
            wgr = t_ms(lambda: tiff_decode_window(data, x0, y0, ww, wh), 3)
            print(f"| large {n}^2 | {name} | {int(pct*100)}% "
                  f"| {wgr:.2f} | — | — |")


if __name__ == "__main__":
    main()
