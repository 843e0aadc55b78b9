"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shape, per-executor lazy decoder singleton. Two
decode paths share that plumbing: ``fake=True`` (default) is the
deterministic md5-derived stand-in the oracles replay; ``fake=False``
uses a REAL pure-stdlib decoder for PNG (zlib inflate + per-row filters
0-4, color types 0/2/3/4/6), uncompressed 24-bit BMP, baseline
sequential JPEG (SOF0 Huffman entropy decode, restart markers, float
IDCT, chroma upsampling, JFIF color transform — round 4), and
PROGRESSIVE JPEG (SOF2 spectral selection + successive approximation,
DC/AC first+refinement scans with EOBRUN and correction bits per T.81
G.1.2 — round 5), and baseline TIFF (strip-based 8-bit gray/RGB/RGBA/
palette, both byte orders, none/LZW/PackBits compression with the
horizontal-differencing predictor — round 5). Arithmetic-coded JPEG,
tiled/deep TIFF, WEBP, video demuxing and compressed audio still raise
NotImplementedError per payload, keeping the gate honest.

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


class _RealDecoder:
    """Pure-stdlib image decode (PNG, uncompressed 24-bit BMP, baseline
    AND progressive JPEG, baseline TIFF) — no Pillow/ffmpeg in the
    sandbox; PNG is zlib + per-row filters, JPEG a Huffman+IDCT pipeline
    with the T.81 G.1.2 progressive entropy decoders (_decode_jpeg), and
    TIFF a strip-based IFD walk with TIFF-variant LZW / PackBits
    (_decode_tiff). Formats still needing a codec lib (WEBP, video,
    arithmetic-coded JPEG, tiled TIFF) raise, keeping the gate honest.

    decode_image returns (width, height, feature) with the SAME shape
    contract as the fake decoder: an 8-dim float32 feature — here the
    mean luminance of a 2x4 grid over the decoded pixels, in [0, 1].
    """

    def decode_image(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if payload and payload[:8] == b"\x89PNG\r\n\x1a\n":
            w, h, pix = _decode_png(payload)
        elif payload and payload[:2] == b"BM":
            w, h, pix = _decode_bmp24(payload)
        elif payload and payload[:2] == b"\xff\xd8":
            w, h, pix = _decode_jpeg(payload)
        elif payload and payload[:2] in (b"II", b"MM"):
            w, h, pix = _decode_tiff(payload)
        else:
            raise NotImplementedError(
                "real decode implemented for PNG, 24-bit BMP, "
                "baseline/progressive JPEG and baseline TIFF only "
                "(stdlib path); other formats need a codec lib"
            )
        lum = pix.astype(np.float32).mean(axis=2) / 255.0  # (h, w)
        rows = np.array_split(lum, 2, axis=0)
        feat = np.array(
            [
                float(cell.mean()) if cell.size else 0.0
                for r in rows
                for cell in np.array_split(r, 4, axis=1)
            ],
            dtype=np.float32,
        )
        return w, h, feat

    def sample_frames(self, payload: bytes, n: int) -> list[bytes]:
        raise NotImplementedError(
            "real video frame sampling needs a container demuxer"
        )

    def decode_audio(self, payload: bytes) -> dict:
        """RIFF/WAVE PCM via stdlib struct: (sample_rate, n_channels,
        duration_ms, loudness) with loudness = RMS of int16 samples
        scaled to 0..100 (the fake decoder's value range). Compressed
        containers (MP3/OGG/FLAC) raise."""
        if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise NotImplementedError(
                "real audio decode implemented for RIFF/WAVE PCM only"
            )
        import struct

        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + ln]
            if tag == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif tag == b"data":
                data = body
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise NotImplementedError("WAV missing fmt/data chunk")
        audio_fmt, n_ch, rate, _brate, _align, bits = fmt
        if audio_fmt != 1 or bits != 16:
            raise NotImplementedError(
                "WAV decode supports 16-bit PCM (format tag 1) only"
            )
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        ).astype(np.float64)
        n_frames = len(samples) // max(n_ch, 1)
        duration_ms = int(n_frames * 1000 // max(rate, 1))
        rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
        return {
            "sample_rate": int(rate),
            "n_channels": int(n_ch),
            "duration_ms": duration_ms,
            "loudness": int(round(rms / 32768.0 * 100)),
        }


def _decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Minimal PNG decoder: 8-bit depth, color types 0/2/3/4/6, filters
    0-4, non-interlaced. Returns (w, h, RGB uint8 array)."""
    import struct
    import zlib

    pos, idat, plte = 8, b"", b""
    w = h = bitd = ctype = interlace = None
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitd, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or bitd != 8 or interlace != 0:
        raise NotImplementedError(
            "PNG decode supports 8-bit non-interlaced images only"
        )
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        if ftype == 1:  # Sub — sequential in x, vectorize over channels
            for x in range(nch, stride):
                line[x] = (int(line[x]) + int(line[x - nch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                ul = int(prev[x - nch]) if x >= nch else 0
                a, b, c = left, int(prev[x]), ul
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, nch)
    if ctype == 0:
        return w, h, np.repeat(px, 3, axis=2)
    if ctype == 2:
        return w, h, px
    if ctype == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return w, h, pal[px[:, :, 0]]
    if ctype == 4:
        return w, h, np.repeat(px[:, :, :1], 3, axis=2)
    return w, h, px[:, :, :3]  # 6: drop alpha


_ZIGZAG = np.array(
    [  # ITU-T T.81 Figure 5: zigzag index -> (row * 8 + col) natural index
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# spatial = A.T @ F @ A is the T.81 IDCT
_DCT_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


class _JpegBits:
    """MSB-first bit reader over one destuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy segment")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_huff_table(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(bits: _JpegBits, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | bits.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s-bit magnitude to signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_ecs(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuffed entropy-coded data from ``start``, split at RST markers.
    Returns (segments, next_pos) where next_pos is the 0xFF of the first
    non-RST marker after the scan (EOI, DHT, the next SOS, ...)."""
    segments: list[bytes] = []
    cur = bytearray()
    p, n = start, len(payload)
    while p < n:
        b = payload[p]
        if b == 0xFF and p + 1 < n:
            nx = payload[p + 1]
            if nx == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nx <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # a real marker ends this scan's ECS
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _jpeg_scan_units(
    sel, comps, fh: int, fw: int, mcux: int, mcuy: int
) -> list[list[tuple[int, int, int]]]:
    """Entropy-decode units for one scan: each unit is the list of
    (comp_idx, block_y, block_x) coded between restart checks. Interleaved
    scans (ns > 1) iterate MCUs; single-component scans iterate that
    component's ceil(size/8) block raster (T.81 A.2.2 — NOT padded to MCU
    geometry)."""
    units: list[list[tuple[int, int, int]]] = []
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(sel) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci, _td, _ta in sel:
                    _, hs, vs, _ = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            unit.append((ci, my * vs + by, mx * hs + bx))
                units.append(unit)
    else:
        ci = sel[0][0]
        _, hs, vs, _ = comps[ci]
        cw = (fw * hs + hmax - 1) // hmax
        ch = (fh * vs + vmax - 1) // vmax
        for by in range((ch + 7) // 8):
            for bx in range((cw + 7) // 8):
                units.append([(ci, by, bx)])
    return units


def _decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Sequential (SOF0, incl. multi-scan) and PROGRESSIVE (SOF2,
    spectral selection + successive approximation) 8-bit Huffman JPEG per
    ITU-T T.81: marker parse -> per-scan entropy decode into a
    coefficient store (restart-interval aware; DC first/refine, AC
    first/refine with EOBRUN and correction bits per G.1.2) ->
    dequantize -> dezigzag -> float IDCT -> chroma upsample -> JFIF
    YCbCr->RGB. 1-component (grayscale) and 3-component frames with any
    h/v sampling factors dividing the max (4:4:4, 4:2:2, 4:2:0, ...).

    Extended/lossless/hierarchical frames, arithmetic coding (DAC), and
    12-bit precision raise NotImplementedError — the honest-gate
    contract; corrupt streams raise ValueError. Pure-Python bit loop: a
    correctness decoder for the Spark plumbing gate, not a throughput
    codec (real deployments put libjpeg-turbo behind the same
    mapInPandas surface)."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    progressive = False
    restart = 0
    scans = []  # (sel, Ss, Se, Ah, Al, restart, segments)
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                sp += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[sp : sp + 64], np.uint8).astype(
                        np.int32
                    )
                    sp += 64
                else:
                    tbl = np.frombuffer(
                        seg[sp : sp + 128], ">u2"
                    ).astype(np.int32)
                    sp += 128
                qt[tq] = tbl  # zigzag order, as stored
        elif m in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("JPEG precision != 8 bits")
            comps = []
            for c in range(nc):
                cid, hv, tq_ = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq_))
            frame = (fh, fw, comps)
            progressive = m == 0xC2
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{m - 0xC0} "
                "(baseline SOF0 and progressive SOF2 only)"
            )
        elif m == 0xCC:  # DAC
            raise NotImplementedError("arithmetic-coded JPEG")
        elif m == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                counts = list(seg[sp + 1 : sp + 17])
                nsym = sum(counts)
                symbols = seg[sp + 17 : sp + 17 + nsym]
                huff[(tc, th)] = _jpeg_huff_table(counts, symbols)
                sp += 17 + nsym
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c : 3 + 2 * c]
                idx = next(
                    i for i, comp in enumerate(frame[2]) if comp[0] == cs
                )
                sel.append((idx, tda >> 4, tda & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            segments, pos = _jpeg_ecs(payload, pos + 2 + seglen)
            scans.append(
                (sel, ss, se, ahal >> 4, ahal & 15, restart, segments)
            )
            continue
        # APPn / COM / DNL / others: skip
        pos += 2 + seglen
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # zigzag-order coefficient store per component, MCU-padded geometry
    coeffs = [
        np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int32)
        for c in comps
    ]

    for sel, ss, se, ah, al, dri, segments in scans:
        units = _jpeg_scan_units(sel, comps, fh, fw, mcux, mcuy)
        preds = [0] * len(comps)
        eobrun = 0
        seg_i = 0
        bits = _JpegBits(segments[0])
        td_of = {ci: td for ci, td, _ta in sel}
        ta_of = {ci: ta for ci, _td, ta in sel}
        for u_n, unit in enumerate(units):
            if dri and u_n and u_n % dri == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("JPEG missing restart segment")
                bits = _JpegBits(segments[seg_i])
                preds = [0] * len(comps)
                eobrun = 0
            for ci, by, bx in unit:
                zz = coeffs[ci][by, bx]
                if not progressive:
                    # sequential: full DC+AC in one pass
                    t = _jpeg_huff_decode(bits, huff[(0, td_of[ci])])
                    preds[ci] += _jpeg_extend(bits.read_bits(t), t)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(bits, huff[(1, ta_of[ci])])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _jpeg_extend(bits.read_bits(s), s)
                        k += 1
                elif ss == 0 and ah == 0:
                    # progressive DC first (G.1.2.1): diff scaled by Al
                    t = _jpeg_huff_decode(bits, huff[(0, td_of[ci])])
                    preds[ci] += _jpeg_extend(bits.read_bits(t), t)
                    zz[0] = preds[ci] << al
                elif ss == 0:
                    # DC refinement: one appended bit per block
                    if bits.read_bit():
                        zz[0] |= 1 << al
                elif ah == 0:
                    # AC first (G.1.2.2): band [ss, se], values scaled by
                    # Al, EOBRUN spans blocks
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _jpeg_huff_decode(bits, huff[(1, ta_of[ci])])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += bits.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC band overflow")
                        zz[k] = _jpeg_extend(bits.read_bits(s), s) << al
                        k += 1
                else:
                    # AC refinement (G.1.2.3): new coefficients appear at
                    # +-1<<Al; every already-nonzero coefficient passed on
                    # the way consumes one correction bit
                    p1, m1 = 1 << al, -1 << al
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _jpeg_huff_decode(
                                bits, huff[(1, ta_of[ci])]
                            )
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    eobrun = (1 << r)
                                    if r:
                                        eobrun += bits.read_bits(r)
                                    break
                                newval = 0  # ZRL: skip 16 zero-history
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "JPEG AC refinement size != 1"
                                    )
                                newval = p1 if bits.read_bit() else m1
                            while k <= se:
                                if zz[k] != 0:
                                    if bits.read_bit():
                                        if (zz[k] & p1) == 0:
                                            zz[k] += p1 if zz[k] > 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if k > se:
                                break
                            if newval:
                                zz[k] = newval
                            k += 1
                    if eobrun > 0:
                        # EOB run: only correction bits for the remaining
                        # nonzero coefficients of this block
                        while k <= se:
                            if zz[k] != 0:
                                if bits.read_bit():
                                    if (zz[k] & p1) == 0:
                                        zz[k] += p1 if zz[k] > 0 else m1
                            k += 1
                        eobrun -= 1

    # reconstruction: dequantize + dezigzag + IDCT every block
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    for ci, (_cid, hs, vs, tq_) in enumerate(comps):
        if tq_ not in qt:
            raise ValueError("JPEG missing quantization table")
        q = qt[tq_]
        for by in range(coeffs[ci].shape[0]):
            for bx in range(coeffs[ci].shape[1]):
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = coeffs[ci][by, bx] * q
                block = _DCT_A.T @ coef.reshape(8, 8) @ _DCT_A
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    block + 128.0
                )

    # upsample each plane to full frame geometry, crop to (fh, fw)
    full = []
    for (cid, hs, vs, tq_), pl in zip(comps, planes):
        up = np.repeat(np.repeat(pl, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(up[:fh, :fw])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return fw, fh, np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise NotImplementedError("JPEG with component count not in (1, 3)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return fw, fh, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first codes, Clear=256,
    EOI=257, 9->12 bit widths with EARLY CHANGE (the width bumps one code
    before the table fills — the quirk that distinguishes TIFF LZW from
    GIF's)."""
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 clear
        table.append(b"")  # 257 eoi

    reset()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF LZW code out of range")
            out += entry
            prev = entry
            # early change, decoder side: the decoder's table runs one
            # entry BEHIND the encoder's (the classic LZW lag), so it
            # must widen one code earlier than table-full — when the
            # next-to-assign slot reaches 2^width - 2 (libtiff's
            # maxcode-1 rule)
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out)


def _tiff_packbits_decode(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 §9): n>=0 -> n+1 literals; -127..-1 -> repeat
    next byte 1-n times; -128 no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("PackBits run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # 128: no-op
    return bytes(out[:expected])


def _decode_tiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline TIFF 6.0 (round 5): strip-based, 8 bits/sample, gray
    (white-is-zero and black-is-zero), RGB/RGBA and palette-color, both
    byte orders, Compression 1 (none) / 5 (LZW incl. the horizontal-
    differencing Predictor 2) / 32773 (PackBits).

    Tiled layouts, other bit depths, JPEG-in-TIFF, CCITT fax codings and
    planar configuration 2 raise NotImplementedError — the honest-gate
    contract; corrupt structures raise ValueError."""
    import struct

    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF (missing byte-order mark)")
    end = "<" if payload[:2] == b"II" else ">"
    try:
        return _decode_tiff_checked(payload, end)
    except struct.error as exc:  # truncated structures -> loud ValueError
        raise ValueError(f"corrupt TIFF structure: {exc}") from exc


def _decode_tiff_checked(
    payload: bytes, end: str
) -> tuple[int, int, np.ndarray]:
    import struct

    magic, ifd_off = struct.unpack(end + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")

    def read_ifd(off: int) -> dict[int, tuple[int, list[int]]]:
        (n,) = struct.unpack(end + "H", payload[off : off + 2])
        entries: dict[int, tuple[int, list[int]]] = {}
        type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
        type_fmt = {1: "B", 3: "H", 4: "I"}
        for i in range(n):
            e = payload[off + 2 + 12 * i : off + 14 + 12 * i]
            tag, typ, cnt = struct.unpack(end + "HHI", e[:8])
            if typ not in type_size:
                continue  # ignore rationals/ASCII we never consume
            total = type_size[typ] * cnt
            raw = e[8:12] if total <= 4 else None
            if raw is None:
                (voff,) = struct.unpack(end + "I", e[8:12])
                raw = payload[voff : voff + total]
            if typ in type_fmt:
                vals = list(
                    struct.unpack(end + type_fmt[typ] * cnt, raw[:total])
                )
            else:
                vals = []
            entries[tag] = (typ, vals)
        return entries

    ifd = read_ifd(ifd_off)

    def tag(t: int, default=None):
        if t not in ifd:
            if default is None:
                raise ValueError(f"TIFF missing required tag {t}")
            return default
        return ifd[t][1]

    w = tag(256)[0]
    h = tag(257)[0]
    comp = tag(259, [1])[0]
    photo = tag(262)[0]
    spp = tag(277, [1])[0]
    bps = tag(258, [8] * spp)
    rows_per_strip = tag(278, [h])[0] or h
    offsets = tag(273)
    counts = tag(279)
    predictor = tag(317, [1])[0]
    if 322 in ifd or 323 in ifd:
        raise NotImplementedError("tiled TIFF")
    if tag(284, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if any(b != 8 for b in bps):
        raise NotImplementedError("TIFF bits-per-sample != 8")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (none/LZW/PackBits only)"
        )
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts mismatch")

    row_bytes = w * spp
    raster = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        expected = nrows * row_bytes
        chunk = payload[o : o + c]
        if len(chunk) != c:
            raise ValueError("TIFF strip out of bounds")
        if comp == 5:
            strip = _tiff_lzw_decode(chunk, expected)
        elif comp == 32773:
            strip = _tiff_packbits_decode(chunk, expected)
        else:
            strip = chunk[:expected]
        if len(strip) < expected:
            raise ValueError("TIFF strip underflow")
        raster += strip[:expected]
    arr = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: cumulative sum per row per sample
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")

    if photo == 2:  # RGB / RGBA (extra samples dropped)
        if spp < 3:
            raise ValueError("TIFF RGB with <3 samples")
        return w, h, np.ascontiguousarray(arr[:, :, :3])
    if photo == 3:  # palette-color
        cmap = tag(320)
        if len(cmap) != 3 * 256:
            raise NotImplementedError("TIFF palette with non-256 entries")
        lut = (
            np.array(cmap, dtype=np.uint16).reshape(3, 256).T >> 8
        ).astype(np.uint8)
        return w, h, lut[arr[:, :, 0]]
    g = arr[:, :, 0]
    if photo == 0:  # white-is-zero
        g = 255 - g
    return w, h, np.repeat(g[:, :, None], 3, axis=2)


def _decode_bmp24(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows)."""
    import struct

    off = struct.unpack("<I", payload[10:14])[0]
    hdr = struct.unpack("<I", payload[14:18])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if hdr < 40 or bpp != 24 or comp != 0:
        raise NotImplementedError("BMP decode supports uncompressed 24-bit")
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(abs(h)):
        start = off + y * stride
        row = np.frombuffer(payload[start : start + w * 3], dtype=np.uint8)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    px = np.stack(rows)
    if h > 0:
        px = px[::-1]  # bottom-up storage
    return w, abs(h), px


_DECODER: _FakeDecoder | None = None
_REAL_DECODER: _RealDecoder | None = None


def _get_decoder(fake: bool) -> _FakeDecoder | _RealDecoder:
    global _DECODER, _REAL_DECODER
    if not fake:
        # real stdlib PNG/BMP path (per-executor singleton like the fake);
        # unsupported containers raise inside decode_image per payload
        if _REAL_DECODER is None:
            _REAL_DECODER = _RealDecoder()
        return _REAL_DECODER
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

    Same plumbing contract as image_features: fake=True (default) is the
    deterministic md5-derived stand-in the oracles replay; fake=False
    parses real RIFF/WAVE 16-bit PCM with stdlib struct (rate/channels/
    duration from the headers, loudness = RMS scaled to 0..100) and
    raises per payload for compressed containers."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _get_decoder(fake)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    feats = dec.decode_audio(payload)
                else:
                    h = hashlib.md5(payload or b"").digest()
                    feats = {
                        "sample_rate": _SAMPLE_RATES[h[2] % 5],
                        "n_channels": 1 + (h[3] % 2),
                        "duration_ms": 500
                        + (int.from_bytes(h[4:6], "big") % 600000),
                        "loudness": h[6] % 101,
                    }
                rows.append(
                    {
                        "media_id": mid,
                        **feats,
                        "n_bytes": len(payload or b""),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    pruned = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return pruned.mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)
