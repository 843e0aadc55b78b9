"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shape, per-executor lazy decoder singleton — while
the actual codec work is stubbed (the sandbox ships no image/audio libs):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (dimensions/features derived from the
payload bytes) stands in so the distributed path is exercisable end-to-end.

At 100 TB the rules that matter here: never let the binary column through a
shuffle you don't need (project it away before joins/aggs), bound Arrow batch
bytes (session.py caps records/batch), and keep decode state (codec contexts,
model weights) executor-local — the same worker-reuse pattern as the
extraction stage (reference: backend/server.js:110-121).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


class _FakeDecoder:
    """Deterministic stand-in for a real codec (per-executor singleton)."""

    def decode_image(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.md5(payload or b"").digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        # 8-dim 'feature' derived from payload bytes — stable, unit-free
        feat = np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0
        return width, height, feat

    def sample_frames(self, payload: bytes, n: int) -> list[bytes]:
        step = max(1, len(payload or b"") // max(n, 1))
        return [bytes((payload or b"")[i * step : i * step + 16]) for i in range(n)]


_DECODER: _FakeDecoder | None = None


def _get_decoder(fake: bool) -> _FakeDecoder:
    global _DECODER
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires Pillow/ffmpeg — not shipped in "
            "this sandbox; pass fake=True for the deterministic stand-in"
        )
    if _DECODER is None:  # lazy executor-local init, reused across batches
        _DECODER = _FakeDecoder()
    return _DECODER


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary payload -> (dims, phash, feature vector) via Arrow batches."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _get_decoder(fake)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = dec.decode_image(payload)
                phash = int.from_bytes(
                    hashlib.md5(payload or b"").digest()[8:16], "big", signed=True
                )
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_bytes": len(payload or b""),
                        "phash": phash,
                        "feature": [float(x) for x in feat],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    pruned = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return pruned.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """1 video row -> n frame rows (the fan-out shape of real frame sampling)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _get_decoder(fake)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, fb in enumerate(dec.sample_frames(payload, n_frames)):
                    rows.append({"media_id": mid, "frame_idx": idx, "frame_bytes": fb})
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    pruned = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return pruned.mapInPandas(gen, schema=FRAME_SAMPLE_SCHEMA)


def phash_near_dup_pairs(
    features: DataFrame, max_hamming: int = 6, chunk_cap: int = 64
) -> DataFrame:
    """Perceptual-hash near-dup pairs, same chunk-blocking + degenerate-group
    guard as SimHash (operators/dedup.py:simhash_near_pairs): one exchange on
    (chunk_pos, chunk_val), sorted members per group, pair gen + hamming
    verify inside codegen array expressions, groups above ``chunk_cap``
    dropped (e.g. every empty/placeholder image sharing one phash would
    otherwise self-join O(n^2) at web scale)."""
    chunks = features.select(
        "media_id", "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("phash"), c * 16).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_pos", "chunk_val"),
    )
    from invoice_ocr_reconciler_spark.operators.dedup import capped_member_groups

    grouped = capped_member_groups(
        chunks, ["chunk_pos", "chunk_val"], F.struct("media_id", "phash"), chunk_cap
    )
    pairs_expr = f"""
        filter(
          flatten(transform(members, (m, i) ->
            transform(slice(members, i + 2, size(members) - i - 1), o ->
              struct(m.media_id AS media_a, o.media_id AS media_b,
                     bit_count(m.phash ^ o.phash) AS hamming)))),
          p -> p.hamming <= {int(max_hamming)})
    """
    return (
        grouped.select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.media_a", "p.media_b", F.col("p.hamming").cast("int").alias("hamming"))
        .dropDuplicates(["media_a", "media_b"])
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("loudness", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)

_SAMPLE_RATES = [8000, 16000, 22050, 44100, 48000]


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary audio payload -> (rate, channels, duration, loudness proxy).

    Same plumbing contract as image_features: real codec stubbed (no
    ffmpeg/audio libs in the sandbox), deterministic md5-derived fake keeps
    the distributed path exercisable and oracle-checkable end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_decoder(fake)  # raises unless the fake decoder is allowed
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.md5(payload or b"").digest()
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": _SAMPLE_RATES[h[2] % 5],
                        "n_channels": 1 + (h[3] % 2),
                        "duration_ms": 500 + (int.from_bytes(h[4:6], "big") % 600000),
                        "loudness": h[6] % 101,
                        "n_bytes": len(payload or b""),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    pruned = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return pruned.mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)
