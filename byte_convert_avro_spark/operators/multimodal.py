"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions.

The Spark-side machinery — schemas, batch iteration, partition sizing —
is real and tested; the actual media decoding is STUBBED because this
container ships no image/audio libraries.  Each stub either raises
``NotImplementedError`` (production path: plug Pillow/soundfile/av into
the marked hook) or, with ``deterministic_fake=True``, derives metadata
from the bytes deterministically so the distributed plumbing can be
exercised end-to-end in tests.

Design notes for 100 TB:
- media bytes ride in parquet binary columns next to their metadata, so
  predicate pushdown on metadata prunes row groups before any byte is
  decoded;
- ``mapInPandas`` streams Arrow batches — decode memory is bounded by
  batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``), not
  partition size;
- decoded features (dims, fingerprints, embeddings) write back as columns
  so later stages never re-touch the blob.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of the metadata struct produced by decode_image_metadata
IMAGE_META_SCHEMA = (
    "width int, height int, channels int, format string, n_bytes long, content_md5 string"
)


def _fake_image_meta(data: bytes) -> dict:
    """Deterministic stand-in for a real image header parse."""
    import hashlib

    h = hashlib.md5(data).hexdigest()
    return {
        "width": (int(h[:4], 16) % 1920) + 1,
        "height": (int(h[4:8], 16) % 1080) + 1,
        "channels": (int(h[8], 16) % 3) + 1,
        "format": ["png", "jpeg", "webp"][int(h[9], 16) % 3],
        "n_bytes": len(data),
        "content_md5": h,
    }


def decode_image_metadata(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode image headers into typed metadata columns.

    The REAL path needs no imaging library: PNG/JPEG/GIF/BMP dimensions
    live in plain header structs, parsed pure-Python by
    :mod:`operators.media_headers` — unrecognized or malformed bytes
    yield a PERMISSIVE ``format='unknown'`` row with NULL dimensions
    (the decode engine's error-channel discipline), never a task
    failure.  ``deterministic_fake=True`` keeps the hash-derived
    metadata for the oracle queries over the synthetic corpus (whose
    blobs are not real images).  Only pixel DECODING (resize, features)
    still requires Pillow — see :func:`resize_images`.
    -> (id_col, width, height, channels, format, n_bytes, content_md5)
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from byte_convert_avro_spark.operators.media_headers import (
            parse_image_header,
        )

        def _decode(data: bytes) -> dict:
            if deterministic_fake:
                return _fake_image_meta(data)
            meta = parse_image_header(data)
            if meta is None:
                meta = {
                    "width": None, "height": None, "channels": None,
                    "format": "unknown",
                }
            meta["n_bytes"] = len(data)
            meta["content_md5"] = hashlib.md5(data).hexdigest()
            return meta

        for pdf in it:
            metas = [_decode(bytes(b)) for b in pdf[blob_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=f"{id_col} long, {IMAGE_META_SCHEMA}")


def frame_sample_positions(
    df: DataFrame, duration_col: str = "duration_ms", every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame position.
    Pure column expressions (the expensive per-frame decode happens later,
    on the exploded rows, in bounded batches).  Adds ``frame_ms``."""
    return df.withColumn(
        "frame_ms",
        F.explode(F.sequence(F.lit(0), F.col(duration_col) - 1, F.lit(every_ms))),
    )


def blob_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap metadata that never needs a decoder: size, hash, magic-byte
    sniff.  Native expressions only."""
    head = F.hex(F.substring(F.col(blob_col), 1, 4))
    return (
        df.withColumn("n_bytes", F.length(blob_col))
        .withColumn("content_md5", F.md5(blob_col))
        .withColumn(
            "sniffed_format",
            F.when(head.startswith("89504E47"), "png")
            .when(head.startswith("FFD8FF"), "jpeg")
            .when(head.startswith("52494646"), "riff")
            .otherwise("unknown"),
        )
    )


def _fake_resize(data: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a real resize: a content+target-derived
    payload (so downstream hashing/dedup over 'resized' blobs is
    exercised with real, distinct bytes)."""
    import hashlib

    h1 = hashlib.md5(data + f"|{w}x{h}".encode()).hexdigest()
    return (h1 + f"|{w}x{h}-resized").encode()


def resize_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    target_w: int = 64,
    target_h: int = 64,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize image blobs to (target_w, target_h), emitting the resized
    bytes plus oracle-friendly digests.  Production hook: Pillow
    ``Image.open(...).resize(...)`` in ``_resize``; the distributed shape
    (Arrow batches in, new binary + typed columns out) is final.
    -> (id_col, resized binary, out_w, out_h, out_bytes, resized_md5)"""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _resize(data: bytes) -> bytes:
            if deterministic_fake:
                return _fake_resize(data, target_w, target_h)
            raise NotImplementedError(
                "real image resizing needs an imaging library (e.g. Pillow); "
                "this container ships none — pass deterministic_fake=True "
                "to exercise the pipeline"
            )

        for pdf in it:
            resized = [_resize(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": resized,
                    "out_w": target_w,
                    "out_h": target_h,
                    "out_bytes": [len(r) for r in resized],
                    "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, resized binary, out_w int, out_h int, "
            "out_bytes long, resized_md5 string"
        ),
    )


#: schema of the metadata struct produced by decode_audio_metadata
AUDIO_META_SCHEMA = (
    "duration_ms long, sample_rate int, channels int, codec string, "
    "n_bytes long, content_md5 string"
)

_AUDIO_RATES = [8000, 16000, 22050, 44100, 48000]


def _fake_audio_meta(data: bytes) -> dict:
    """Deterministic stand-in for a real audio header parse (soundfile/
    mutagen would read the container header)."""
    import hashlib

    h = hashlib.md5(data).hexdigest()
    return {
        "duration_ms": (int(h[:5], 16) % 600000) + 1000,
        "sample_rate": _AUDIO_RATES[int(h[5], 16) % 5],
        "channels": (int(h[6], 16) % 2) + 1,
        "codec": ["wav", "mp3", "flac", "opus"][int(h[7], 16) % 4],
        "n_bytes": len(data),
        "content_md5": h,
    }


def decode_audio_metadata(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode audio container headers into typed metadata columns — the
    audio twin of :func:`decode_image_metadata`.

    The REAL path parses WAV/RIFF, FLAC-STREAMINFO and MP3 frame
    headers pure-Python (:mod:`operators.media_headers` — channels,
    sample rate, duration from the fmt/data chunks, the STREAMINFO
    bit-pack, or the MPEG frame fields with a CBR duration estimate, no
    audio library); unrecognized containers
    (opus/aac need a codec library) yield a PERMISSIVE
    ``codec='unknown'`` row with NULL fields.  ``deterministic_fake=True``
    keeps the hash-derived metadata for the oracle queries over the
    synthetic corpus.  Only sample DECODING (resample, fingerprint)
    still requires soundfile — see :func:`resample_audio`.
    -> (id_col, duration_ms, sample_rate, channels, codec, n_bytes,
    content_md5)"""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from byte_convert_avro_spark.operators.media_headers import (
            parse_flac_header,
            parse_mp3_header,
            parse_wav_header,
        )

        def _decode(data: bytes) -> dict:
            if deterministic_fake:
                return _fake_audio_meta(data)
            meta = (
                parse_wav_header(data)
                or parse_flac_header(data)
                or parse_mp3_header(data)
            )
            if meta is None:
                meta = {
                    "duration_ms": None, "sample_rate": None,
                    "channels": None, "codec": "unknown",
                }
            meta["n_bytes"] = len(data)
            meta["content_md5"] = hashlib.md5(data).hexdigest()
            return meta

        for pdf in it:
            metas = [_decode(bytes(b)) for b in pdf[blob_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(
        run, schema=f"{id_col} long, {AUDIO_META_SCHEMA}"
    )


def _fake_resample(data: bytes, rate: int) -> bytes:
    """Deterministic stand-in for a real resample: content+target-derived
    payload, same discipline as :func:`_fake_resize`."""
    import hashlib

    h1 = hashlib.md5(data + f"|{rate}hz".encode()).hexdigest()
    return (h1 + f"|{rate}hz-resampled").encode()


def resample_audio(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    target_rate: int = 16000,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resample audio blobs to ``target_rate`` Hz, emitting the new bytes
    plus oracle-friendly digests — the audio twin of
    :func:`resize_images`.  Production hook: librosa/soxr resample in
    ``_resample``; the distributed shape (Arrow batches in, new binary +
    typed columns out) is final.
    -> (id_col, resampled binary, out_rate, out_bytes, resampled_md5)"""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _resample(data: bytes) -> bytes:
            if deterministic_fake:
                return _fake_resample(data, target_rate)
            raise NotImplementedError(
                "real audio resampling needs an audio library (e.g. "
                "librosa/soxr); this container ships none — pass "
                "deterministic_fake=True to exercise the pipeline"
            )

        for pdf in it:
            resampled = [_resample(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resampled": resampled,
                    "out_rate": target_rate,
                    "out_bytes": [len(r) for r in resampled],
                    "resampled_md5": [hashlib.md5(r).hexdigest() for r in resampled],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, resampled binary, out_rate int, "
            "out_bytes long, resampled_md5 string"
        ),
    )


def audio_fingerprint(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Acoustic fingerprint per blob — the dedup/similarity key for audio
    (production hook: chromaprint/fpcalc over the decoded PCM; the fake
    is a 16-hex md5-derived digest reproducible in SQL so the pipeline
    sits under the oracle gate).  -> (id_col, fingerprint string)"""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _fp(data: bytes) -> str:
            if deterministic_fake:
                h = hashlib.md5(data).hexdigest()
                return hashlib.md5((h + "|fp").encode()).hexdigest()[:16]
            raise NotImplementedError(
                "real audio fingerprinting needs chromaprint/fpcalc; this "
                "container ships none — pass deterministic_fake=True to "
                "exercise the pipeline"
            )

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "fingerprint": [_fp(bytes(b)) for b in pdf[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        run, schema=f"{id_col} long, fingerprint string"
    )


def _fake_features(data: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real feature extractor: ``dim`` values
    in [-1, 1] derived from md5 byte pairs — reproducible in SQL, so the
    full multimodal->similarity pipeline sits under the oracle gate."""
    import hashlib

    h = hashlib.md5(data).hexdigest()
    return [(int(h[2 * i: 2 * i + 2], 16) - 127.5) / 127.5 for i in range(dim)]


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    dim: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Extract an embedding from each blob (production hook: a vision
    encoder over the decoded image; ``dim`` <= 16 for the md5-derived
    fake).  The output feeds the similarity operators directly
    (``operators/similarity.cosine_topk`` etc.).
    -> (id_col, features array<double>)"""
    if not 1 <= dim <= 16:
        raise ValueError(f"dim must be in [1, 16] (md5 supplies 16 byte pairs), got {dim}")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _extract(data: bytes) -> list[float]:
            if deterministic_fake:
                return _fake_features(data, dim)
            raise NotImplementedError(
                "real feature extraction needs a vision encoder; this "
                "container ships none — pass deterministic_fake=True to "
                "exercise the pipeline"
            )

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "features": [_extract(bytes(b)) for b in pdf[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        run, schema=f"{id_col} long, features array<double>"
    )


#: schema of the metadata struct produced by decode_video_metadata
VIDEO_META_SCHEMA = (
    "duration_ms long, width int, height int, format string, "
    "n_bytes long, content_md5 string"
)


def decode_video_metadata(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode video container headers into typed metadata columns — the
    video member of the decode_image_metadata / decode_audio_metadata
    family, completing REAL header parsing across all three modalities.

    Parses MP4/ISO-BMFF pure-Python (:mod:`operators.media_headers.
    parse_mp4_header` — movie duration from ``moov/mvhd``, dimensions
    from the first ``trak/tkhd``, no video library); unrecognized or
    moov-less containers (MKV/EBML, AVI, or streaming-optimized MP4s
    whose moov trails the data range supplied) yield a PERMISSIVE
    ``format='unknown'`` row.  FRAME decoding (pixels) remains behind
    the documented av/ffmpeg hook — see :func:`frame_sample_positions`
    for the sampling plan that would feed it.
    -> (id_col, duration_ms, width, height, format, n_bytes,
    content_md5)"""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from byte_convert_avro_spark.operators.media_headers import (
            parse_mp4_header,
        )

        def _decode(data: bytes) -> dict:
            meta = parse_mp4_header(data)
            if meta is None:
                meta = {
                    "duration_ms": None, "width": None,
                    "height": None, "format": "unknown",
                }
            meta["n_bytes"] = len(data)
            meta["content_md5"] = hashlib.md5(data).hexdigest()
            return meta

        for pdf in it:
            metas = [_decode(bytes(b)) for b in pdf[blob_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(
        run, schema=f"{id_col} long, {VIDEO_META_SCHEMA}"
    )
