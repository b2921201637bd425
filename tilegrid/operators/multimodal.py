"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, processed in Arrow-batched pandas UDFs (`mapInPandas`).

The Spark-side plumbing — schema, batch shape, partitioning, UDF signatures —
is real and tested. Codec availability differs by deployment:
  - image: real from-scratch PNG codec + real from-scratch baseline JPEG
    (tilegrid.codec / tilegrid.jpeg); 'fjpg' is the fast deterministic
    stand-in kept for the synthetic throughput corpus.
  - audio/video: STUBS — `decode_audio` / `sample_frames` raise
    NotImplementedError unless `fake=True`, which substitutes a
    deterministic synthetic signal so the distributed plumbing is testable.

Reference parity: images decode to the same NumPy tile arrays the reference's
GeoTiff reader produces (raster/io/geotiff/SinglebandGeoTiff.scala:61-88);
per-row invariant is decoded-pixel allclose (PSNR>=40dB for lossy) +
caption byte-equality (BASELINE.json input_hint).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec

_FEAT_SCHEMA = (
    "image_id string, w int, h int, fmt string, px_sum long, px_sq_sum long,"
    " px_mean double, px_std double, px_min double, px_max double, phash long"
)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def image_features(
    df: DataFrame, bytes_col: str = "tile", id_col: str = "image_id"
) -> DataFrame:
    """Decode each image batch and emit per-image pixel statistics + a
    64-bit perceptual hash. One narrow Arrow pass — the decode stays off
    the driver and off the shuffle.

    Mean/std are derived from EXACT integer moments (px_sum, px_sq_sum —
    emitted too): uint8 pixel sums are exact in int64, so the doubles are
    a fixed expression over exact integers and a SQL oracle replaying the
    same algebra reproduces them bit-for-bit (summation-order float drift
    can't creep in, unlike a streaming variance)."""
    from ..fixtures import phash64

    def run(it):
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(getattr(t, bytes_col)), t.fmt)
                ai = arr.astype(np.int64)
                n = ai.size
                s1 = int(ai.sum())
                s2 = int((ai * ai).sum())
                mean = s1 / n
                std = math.sqrt(max(s2 / n - mean * mean, 0.0))
                rows.append(
                    (
                        getattr(t, id_col),
                        np.int32(arr.shape[1]),
                        np.int32(arr.shape[0]),
                        t.fmt,
                        np.int64(s1),
                        np.int64(s2),
                        mean,
                        std,
                        float(ai.min()),
                        float(ai.max()),
                        np.int64(phash64(arr.astype(np.float64))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "fmt", "px_sum", "px_sq_sum",
                    "px_mean", "px_std", "px_min", "px_max", "phash",
                ],
            )

    return df.mapInPandas(run, _FEAT_SCHEMA)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    bytes_col: str = "tile",
    method: str = "bilinear",
) -> DataFrame:
    """Batch resize: decode -> resample (NN/bilinear, tilegrid.tiles) ->
    re-encode. Output schema == input schema with updated w/h/bytes."""
    from ..tiles import resample_bilinear, resample_nearest

    resample = resample_bilinear if method == "bilinear" else resample_nearest
    schema = df.schema

    def run(it):
        for pdf in it:
            out = pdf.copy()
            new_bytes, fmts = [], out["fmt"].tolist()
            for raw, fmt in zip(out[bytes_col], fmts):
                arr = codec.decode_tile(bytes(raw), fmt)
                res = resample(arr.astype(np.float64), out_h, out_w)
                if fmt in ("png", "jpeg", "fjpg"):
                    res = np.clip(np.rint(res), 0, 255).astype(np.uint8)
                new_bytes.append(codec.encode_tile(res, fmt))
            out[bytes_col] = new_bytes
            out["w"] = np.int32(out_w)
            out["h"] = np.int32(out_h)
            yield out

    return df.mapInPandas(run, schema)


# ----------------------------------------------------------- audio / video

AUDIO_FEAT_SCHEMA = (
    "clip_id string, n_samples long, sample_rate int, rms double, zcr double"
)


def decode_audio(
    df: DataFrame,
    bytes_col: str = "audio",
    id_col: str = "clip_id",
    fake: bool = False,
) -> DataFrame:
    """Audio decode + features (RMS, zero-crossing rate).

    STUB: no audio codec library ships in this container. With fake=True a
    deterministic synthetic waveform (seeded by the byte length and first 8
    bytes) stands in for the decoded PCM so the Spark plumbing — batch
    iteration, schema, feature math — is fully exercised. In production,
    replace `_decode` with e.g. soundfile/librosa; nothing else changes."""

    def _decode(raw: bytes) -> tuple[np.ndarray, int]:
        if not fake:
            raise NotImplementedError(
                "audio codecs not available in this environment; "
                "pass fake=True for the deterministic test stub"
            )
        seed = int.from_bytes(raw[:8].ljust(8, b"\0"), "little") % (2**32)
        rng = np.random.default_rng(seed)
        n = 1000 + len(raw) % 1000
        return rng.standard_normal(n).astype(np.float32), 16000

    def run(it):
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                pcm, sr = _decode(bytes(getattr(t, bytes_col)))
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
                zcr = float(np.mean(np.abs(np.diff(np.signbit(pcm)))))
                rows.append((getattr(t, id_col), len(pcm), sr, rms, zcr))
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "n_samples", "sample_rate", "rms", "zcr"],
            )

    return df.mapInPandas(run, AUDIO_FEAT_SCHEMA)


FRAME_SCHEMA = "video_id string, frame_idx int, frame binary, w int, h int"


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    bytes_col: str = "video",
    id_col: str = "video_id",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a flatMap-
    shaped mapInPandas — rows amplify, schema is explicit).

    STUB: no video demuxer in this container. fake=True synthesizes a
    deterministic 4-'frame' clip from the bytes so downstream tiling/feature
    stages can be tested; swap `_frames` for pyav/ffmpeg in production."""

    def _frames(raw: bytes):
        if not fake:
            raise NotImplementedError(
                "video codecs not available in this environment; "
                "pass fake=True for the deterministic test stub"
            )
        seed = len(raw)
        for idx in range(0, 4 * every_n, every_n):
            arr = np.full((16, 16), (seed + idx) % 256, dtype=np.uint8)
            yield idx, codec.encode_tile(arr, "png"), 16, 16

    def run(it):
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                vid = getattr(t, id_col)
                for idx, frame, w, h in _frames(bytes(getattr(t, bytes_col))):
                    rows.append((vid, np.int32(idx), frame, np.int32(w), np.int32(h)))
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "frame", "w", "h"]
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


# The SDXL-style aspect-bucket table: fixed (w, h) training resolutions of
# roughly equal pixel area; every image trains at the bucket whose aspect
# ratio is nearest its own, so batches stay shape-homogeneous without
# square-cropping away content.
ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (256, 256),
    (320, 192), (192, 320),
    (384, 160), (160, 384),
    (320, 256), (256, 320),
)


def aspect_bucket(
    df: DataFrame,
    buckets: tuple[tuple[int, int], ...] = ASPECT_BUCKETS,
    w: str = "w",
    h: str = "h",
    id_col: str = "image_id",
) -> DataFrame:
    """Aspect-ratio bucketing for image training batches: assign every
    image the bucket minimizing |ln(w/h) - ln(bw/bh)| (log-ratio distance;
    ties to the smaller bucket index). The multimodal data-loader groups
    batches by bucket_id so all tensors in a batch share one shape.

    Pure expression work over the (w, h) METADATA columns — no decode, no
    join, no shuffle: the 7-bucket argmin unrolls into a literal
    expression chain the oracle replays verbatim. Output: id_col, w, h,
    bucket_id, bucket_w, bucket_h.
    """
    from pyspark.sql import functions as F

    expr = bucket_assign_expr(buckets, w, h)
    return df.select(
        F.col(id_col), F.col(w), F.col(h),
        F.expr(expr).cast("int").alias("bucket_id"),
    ).select(
        id_col, w, h, "bucket_id",
        F.expr(_bucket_dim_expr(buckets, 0)).cast("int").alias("bucket_w"),
        F.expr(_bucket_dim_expr(buckets, 1)).cast("int").alias("bucket_h"),
    )


def bucket_assign_expr(
    buckets: tuple[tuple[int, int], ...], w: str, h: str
) -> str:
    """SQL expression: index of the bucket with the nearest log aspect
    ratio. Unrolled argmin over literal ratios — ln/abs/CASE spell the
    same in Spark SQL and DuckDB, so engine and oracle run the IDENTICAL
    expression text (same float math in the same order)."""
    r = f"ln(CAST({w} AS DOUBLE) / {h})"
    dists = [
        f"abs(({r}) - {math.log(bw / bh)!r})" for bw, bh in buckets
    ]
    # argmin with first-wins ties: d_i is the answer iff no earlier d_j is
    # <= d_i and no later d_k is < d_i
    arms = []
    for i in range(len(buckets)):
        conds = [f"{dists[j]} <= {dists[i]}" for j in range(i)] + [
            f"{dists[k]} < {dists[i]}" for k in range(i + 1, len(buckets))
        ]
        guard = " OR ".join(conds) if conds else "FALSE"
        arms.append(f"WHEN NOT ({guard}) THEN {i}")
    return "CASE " + " ".join(arms) + " ELSE 0 END"


def _bucket_dim_expr(buckets, axis: int) -> str:
    """CASE mapping bucket_id -> literal bucket width/height."""
    arms = " ".join(
        f"WHEN bucket_id = {i} THEN {b[axis]}" for i, b in enumerate(buckets)
    )
    return f"CASE {arms} END"


def codec_error_stats(
    df: DataFrame,
    fmt: str = "jpeg",
    id_col: str = "image_id",
    data_col: str = "tile",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Lossy-codec QA over the corpus: decode each image, round-trip it
    through the lossy `fmt`, and emit the EXACT integer error sum —
    (id, n_samples, sse, psnr_ge_40). The north-rule per-row invariant
    (decoded pixels PSNR >= 40 dB for lossy formats) becomes a checkable
    column: PSNR >= 40 <=> MSE <= peak^2 * 1e-4 <=> sse * 10^4 <=
    n_samples * 255^2 — pure integer math, so engines hash-agree (a float
    log10 would not). One Arrow batch pass, no shuffle."""
    from pyspark.sql import functions as F

    def run(it):
        for pdf in it:
            out = []
            for rid, data, f in zip(
                pdf[id_col], pdf[data_col], pdf[fmt_col]
            ):
                arr = codec.decode_tile(bytes(data), str(f)).astype(np.int64)
                rt = codec.decode_tile(
                    codec.encode_tile(arr.astype(np.uint8), fmt), fmt
                ).astype(np.int64)
                e = arr - rt
                out.append((str(rid), int(arr.size), int((e * e).sum())))
            yield pd.DataFrame(out, columns=[id_col, "n_samples", "sse"])

    res = df.mapInPandas(run, f"{id_col} string, n_samples long, sse long")
    return res.withColumn(
        "psnr_ge_40", F.expr("sse * 10000 <= n_samples * 65025")
    )
