"""REAL media header parsing — pure stdlib ``struct``, no imaging/audio
library, so it runs in this container and on any executor.

This is the non-stubbed half of the multimodal story: container HEADERS
(dimensions, channels, sample rate, duration) are plain binary structs
that need no codec — only pixel/sample DECODING (resize, resample,
fingerprints, features) requires Pillow/soundfile and stays behind the
documented hooks in :mod:`byte_convert_avro_spark.operators.multimodal`.

Formats: PNG (IHDR), JPEG (SOF marker scan), GIF (logical screen
descriptor), BMP (BITMAPCOREHEADER / BITMAPINFOHEADER+, dispatched on
the DIB size field), WEBP (VP8X canvas / VP8L packed / VP8 key-frame
dims), WAV (RIFF chunk scan), FLAC (STREAMINFO bit-pack),
MP3 (MPEG frame header + ID3v2 skip, CBR duration estimate).
Parsers are
defensive: anything malformed or unrecognized returns ``None`` rather
than raising — the Arrow-batched callers emit a PERMISSIVE
``format='unknown'`` row, mirroring the decode engine's error channel.
"""

from __future__ import annotations

import struct

#: JPEG start-of-frame markers that carry dimensions (C0-CF minus the
#: non-SOF C4/C8/CC: DHT, JPG-extension, DAC)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}

#: PNG color type -> sample channels
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(data: bytes) -> dict | None:
    """-> ``{width, height, channels, format}`` or ``None``."""
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            color_type = data[25]
            return {
                "width": w,
                "height": h,
                "channels": _PNG_CHANNELS.get(color_type, 0),
                "format": "png",
            }
        if data[:2] == b"\xff\xd8":
            pos = 2
            n = len(data)
            while pos + 4 <= n:
                if data[pos] != 0xFF:
                    return None  # marker desync — corrupt stream
                # ITU T.81 allows runs of 0xFF FILL bytes before a marker
                while pos + 1 < n and data[pos + 1] == 0xFF:
                    pos += 1
                if pos + 4 > n:
                    return None
                marker = data[pos + 1]
                if marker == 0xD9:  # EOI before any SOF: no dimensions
                    return None
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    pos += 2  # standalone markers carry no length
                    continue
                (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                    return {
                        "width": w,
                        "height": h,
                        "channels": data[pos + 9],
                        "format": "jpeg",
                    }
                pos += 2 + seg_len
            return None
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return {"width": w, "height": h, "channels": 3, "format": "gif"}
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP" and len(data) >= 20:
            # WebP (public container spec): one of three first chunks.
            fourcc = data[12:16]
            if fourcc == b"VP8X" and len(data) >= 30:
                # extended: flags byte (bit 4 = alpha), 24-bit LE
                # canvas width-1 / height-1
                alpha = (data[20] >> 4) & 1
                w = int.from_bytes(data[24:27], "little") + 1
                h = int.from_bytes(data[27:30], "little") + 1
                return {"width": w, "height": h,
                        "channels": 4 if alpha else 3, "format": "webp"}
            if fourcc == b"VP8L" and len(data) >= 25 and data[20] == 0x2F:
                # lossless: 14-bit width-1 / height-1 + alpha bit packed LE
                b = int.from_bytes(data[21:25], "little")
                return {
                    "width": (b & 0x3FFF) + 1,
                    "height": ((b >> 14) & 0x3FFF) + 1,
                    "channels": 4 if (b >> 28) & 1 else 3,
                    "format": "webp",
                }
            if fourcc == b"VP8 " and len(data) >= 30:
                # lossy key frame: 3-byte frame tag, start code, LE16 dims
                if data[23:26] != b"\x9d\x01\x2a":
                    return None
                w = int.from_bytes(data[26:28], "little") & 0x3FFF
                h = int.from_bytes(data[28:30], "little") & 0x3FFF
                return {"width": w, "height": h, "channels": 3, "format": "webp"}
            return None
        if data[:2] == b"BM" and len(data) >= 22:
            # The dimension layout depends on the DIB header variant,
            # identified by its leading size field: BITMAPCOREHEADER
            # (12 bytes, unsigned 16-bit dims) vs BITMAPINFOHEADER and
            # its extensions (>= 40 bytes, signed 32-bit dims).  Other
            # sizes (e.g. the 16/52/56-byte OS/2 and Adobe oddities we
            # don't recognize) return None per the permissive contract.
            (dib_size,) = struct.unpack("<I", data[14:18])
            if dib_size == 12:
                w, h = struct.unpack("<HH", data[18:22])
                return {"width": w, "height": h, "channels": 3, "format": "bmp"}
            if dib_size >= 40 and len(data) >= 26:
                w, h = struct.unpack("<ii", data[18:26])
                return {"width": w, "height": abs(h), "channels": 3, "format": "bmp"}
            return None
    except (struct.error, IndexError):
        return None
    return None


def parse_wav_header(data: bytes) -> dict | None:
    """-> ``{duration_ms, sample_rate, channels, codec}`` or ``None``.
    Scans RIFF chunks (fmt may not be first); duration from the data
    chunk size over the byte rate, integer math."""
    try:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return None
        pos = 12
        n = len(data)
        fmt = None
        data_size = None
        while pos + 8 <= n:
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if cid == b"fmt " and pos + 24 <= n:
                channels, sample_rate, byte_rate = struct.unpack(
                    "<HII", data[pos + 10 : pos + 20]
                )
                fmt = (channels, sample_rate, byte_rate)
            elif cid == b"data":
                data_size = clen
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data_size is None:
            return None
        channels, sample_rate, byte_rate = fmt
        if byte_rate == 0:
            return None
        return {
            "duration_ms": data_size * 1000 // byte_rate,
            "sample_rate": sample_rate,
            "channels": channels,
            "codec": "wav",
        }
    except (struct.error, IndexError):
        return None


def parse_flac_header(data: bytes) -> dict | None:
    """-> ``{duration_ms, sample_rate, channels, codec}`` or ``None``.

    FLAC native container (public format spec, xiph.org): ``fLaC`` magic,
    then metadata blocks — the first block is MANDATORY STREAMINFO
    (type 0, 34 bytes): after min/max blocksize (2×16 bits) and min/max
    framesize (2×24 bits) comes a 64-bit big-endian pack of
    sample-rate (20 bits) | channels-1 (3) | bits-per-sample-1 (5) |
    total-samples (36).  Duration is integer math
    (``total_samples * 1000 // sample_rate``); a zero sample rate or a
    non-STREAMINFO first block is malformed → None (permissive
    contract, same as the other parsers here)."""
    try:
        if data[:4] != b"fLaC" or len(data) < 8 + 18:
            return None
        block_type = data[4] & 0x7F
        (block_len,) = struct.unpack(">I", b"\x00" + data[5:8])
        if block_type != 0 or block_len < 34:
            return None  # spec: STREAMINFO must be first and 34 bytes
        # skip 2+2 blocksize and 3+3 framesize bytes -> pack at offset 18
        (pack,) = struct.unpack(">Q", data[18:26])
        sample_rate = pack >> 44
        channels = ((pack >> 41) & 0x7) + 1
        total_samples = pack & ((1 << 36) - 1)
        if sample_rate == 0:
            return None
        return {
            "duration_ms": total_samples * 1000 // sample_rate,
            "sample_rate": sample_rate,
            "channels": channels,
            "codec": "flac",
        }
    except (struct.error, IndexError):
        return None


#: MPEG Layer III bitrate tables (kbps), index 1-14 (0=free, 15=bad)
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

#: sample-rate tables by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_MP3_RATES = {
    0b00: (11025, 12000, 8000),
    0b10: (22050, 24000, 16000),
    0b11: (44100, 48000, 32000),
}


def parse_mp3_header(data: bytes) -> dict | None:
    """-> ``{duration_ms, sample_rate, channels, codec}`` or ``None``.

    MPEG audio frame header (public ISO/IEC 11172-3 layout): an optional
    ID3v2 tag (``ID3`` + 10-byte header with a SYNCSAFE 28-bit size) is
    skipped, then the first frame header must follow — 11 sync bits,
    version (MPEG1/2/2.5), LAYER III only (Layer I/II return None — the
    tables differ and 'mp3' means Layer III), bitrate index 1-14,
    sample-rate index 0-2, channel mode (3 = mono).  ``duration_ms`` is
    the CBR ESTIMATE ``audio_bytes * 8 // bitrate_kbps`` — exact for
    constant-bitrate files, a documented approximation for VBR (real
    VBR duration needs a full frame walk or a Xing header).  Integer
    math throughout."""
    try:
        pos = 0
        if data[:3] == b"ID3" and len(data) >= 10:
            size = (
                (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
            )
            # ID3v2.4 footer flag (0x10): a 10-byte footer follows the
            # tag body, NOT counted in the syncsafe size
            pos = 10 + size + (10 if data[5] & 0x10 else 0)
        if pos + 4 > len(data):
            return None
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            return None  # no frame sync where a frame must start
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version == 0b01 or layer != 0b01:  # reserved version / not Layer III
            return None
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            return None  # free-format / invalid
        bitrate_kbps = (
            _MP3_BITRATES_V1 if version == 0b11 else _MP3_BITRATES_V2
        )[br_idx]
        sample_rate = _MP3_RATES[version][sr_idx]
        channels = 1 if ((b3 >> 6) & 0x3) == 0b11 else 2
        audio_bytes = len(data) - pos
        return {
            "duration_ms": audio_bytes * 8 // bitrate_kbps,
            "sample_rate": sample_rate,
            "channels": channels,
            "codec": "mp3",
        }
    except (struct.error, IndexError):
        return None


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) over an ISO-BMFF box
    range; stops (rather than raising) on malformed sizes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize follows the type
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:  # box extends to the end of the enclosing range
            size = end - pos
        if size < header or pos + size > end:
            return  # malformed: don't walk past the container
        yield btype, pos + header, pos + size
        pos += size


def parse_mp4_header(data: bytes) -> dict | None:
    """-> ``{duration_ms, width, height, format}`` or ``None``.

    ISO-BMFF / MP4 (public ISO/IEC 14496-12 box layout): top-level boxes
    are walked to ``moov``; ``moov/mvhd`` carries the movie timescale and
    duration (version 0: 32-bit fields after 4+4 creation/modification
    times; version 1: 64-bit after 8+8), and the first ``moov/trak/tkhd``
    with non-zero dimensions supplies width/height (16.16 fixed point in
    the box's last 8 bytes).  A file without ``moov`` before the data we
    were given (streaming-optimized files put it last — callers that
    only fetch a head range must fetch the tail too) returns None, as
    does any malformed box walk.  ``duration_ms`` is integer math
    (``duration * 1000 // timescale``)."""
    try:
        if len(data) < 16 or data[4:8] != b"ftyp":
            return None
        duration_ms = None
        width = height = None
        for btype, s, e in _iter_boxes(data, 0, len(data)):
            if btype != b"moov":
                continue
            for ctype, cs, ce in _iter_boxes(data, s, e):
                if ctype == b"mvhd" and duration_ms is None:
                    version = data[cs]
                    if version == 0 and ce - cs >= 20:
                        timescale, duration = struct.unpack(
                            ">II", data[cs + 12 : cs + 20]
                        )
                    elif version == 1 and ce - cs >= 32:
                        (timescale,) = struct.unpack(">I", data[cs + 20 : cs + 24])
                        (duration,) = struct.unpack(">Q", data[cs + 24 : cs + 32])
                    else:
                        return None
                    if timescale == 0:
                        return None
                    duration_ms = duration * 1000 // timescale
                elif ctype == b"trak" and width is None:
                    for ttype, ts_, te in _iter_boxes(data, cs, ce):
                        if ttype == b"tkhd" and te - ts_ >= 8:
                            w = int.from_bytes(data[te - 8 : te - 4], "big") >> 16
                            h = int.from_bytes(data[te - 4 : te], "big") >> 16
                            if w and h:
                                width, height = w, h
                            break
        if duration_ms is None:
            return None
        return {
            "duration_ms": duration_ms,
            "width": width,
            "height": height,
            "format": "mp4",
        }
    except (struct.error, IndexError):
        return None
