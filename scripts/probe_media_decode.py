"""Multimodal decode-throughput probe (appends under "round10b_media"
in scale_probe_results.json).

Measures the REAL builtin kernels end-to-end through the Arrow-batched
mapInPandas path (auto mode, per-row routing) at 2k vs 20k media rows:
a mixed corpus of JPEG / GIF / BMP / TIFF-LZW / WEBP-VP8L images, a
G.711 µ-law WAV, an 8k-sample FLAC and an MJPEG AVI. Expected ~linear
growth (per-row Python decode cost, no
shuffle); the probe records rows/s so decoder regressions are visible
round over round.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from energy_data_pipeline_spark.operators import multimodal  # noqa: E402
from scale_probe import timed  # noqa: E402
from tests.test_operators_unit import (  # noqa: E402
    _GIF_GRAY_PAL,
    _avi_bytes,
    _bmp_bytes,
    _gif_bytes,
    _flac_bytes,
    _jpeg_bytes,
    _tiff_bytes,
    _wav_riff_bytes,
    _webp_bytes,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import audioop

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(64, 64, 3)).astype("u1")
    gray = rng.randint(0, 256, size=(64, 64)).astype("u1")
    payloads = [
        ("image", "jpeg", _jpeg_bytes(px)),
        ("image", "gif", _gif_bytes(gray, _GIF_GRAY_PAL)),
        ("image", "bmp", _bmp_bytes(px)),
        (
            "audio",
            "wav",
            _wav_riff_bytes(
                audioop.lin2ulaw(
                    np.full(8000, 8192, dtype="<i2").tobytes(), 2
                ),
                7,
            ),
        ),
        ("video", "avi", _avi_bytes([_jpeg_bytes(gray)])),
        ("image", "tiff", _tiff_bytes(px, compression=5, predictor=2)),
        ("image", "webp", _webp_bytes(px, cache_bits=4, use_lz77=True)),
        (
            "audio",
            "flac",
            _flac_bytes(
                np.cumsum(rng.randint(-200, 201, size=8000)).clip(
                    -32768, 32767
                ),
                bps=16,
                kind="fixed2",
                # real encoders frame at 4096 samples; the test
                # encoder's 64-sample default is a header-parse
                # microbenchmark, not a decode benchmark (round 12 —
                # see SCALE.md for the cross-round comparability note)
                blocksize=4096,
            ),
        ),
    ]
    results: dict[str, float] = {}
    for label, n in (("2k", 2_000), ("20k", 20_000)):
        rows = [
            (i, kind, fmt, 64, 64, 1000, bytearray(p))
            for i, (kind, fmt, p) in enumerate(
                payloads[i % len(payloads)] for i in range(n)
            )
        ]
        media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).repartition(
            32
        )

        def decode():
            multimodal.extract_features(media, fake=None, dim=8).write.format(
                "noop"
            ).mode("overwrite").save()

        results[f"decode_{label}"] = timed(decode)
        results[f"decode_{label}_rows_per_s"] = round(
            n / results[f"decode_{label}"], 0
        )
    summary = {
        "decode_10x": round(results["decode_20k"] / results["decode_2k"], 2),
        "rows_per_s_20k": results["decode_20k_rows_per_s"],
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_probe_results.json",
    )
    try:
        existing = json.load(open(out_path))
    except Exception:
        existing = {}
    existing["round10b_media"] = {"raw": results, "summary": summary}
    json.dump(existing, open(out_path, "w"), indent=1)
    print(json.dumps({"raw": results, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
