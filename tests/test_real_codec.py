"""Real stdlib PNG/BMP decode path (operators/multimodal.py:_RealDecoder).

The fixtures are handcrafted byte-level images (struct + zlib, no image
library), so the test proves the decoder against the FORMAT SPECS, not
against another codec. The fake-decoder path (what the multimodal oracles
replay) is untouched — see test_fake_path_unchanged."""

import struct
import zlib

import numpy as np
import pytest

from invoice_ocr_reconciler_spark.operators.multimodal import (
    _decode_bmp24,
    _decode_png,
    _RealDecoder,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png(pixels: np.ndarray, ctype: int, filters: list[int]) -> bytes:
    """Encode (h, w, nch) uint8 pixels as a PNG using the given per-row
    filter types (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth)."""
    h, w, nch = pixels.shape
    raw = b""
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.uint8)
        f = filters[y % len(filters)]
        enc = line.astype(np.int32).copy()
        for x in range(w * nch - 1, -1, -1):
            left = int(line[x - nch]) if x >= nch else 0
            up = int(prev[x])
            ul = int(prev[x - nch]) if x >= nch else 0
            if f == 1:
                enc[x] = (int(line[x]) - left) & 0xFF
            elif f == 2:
                enc[x] = (int(line[x]) - up) & 0xFF
            elif f == 3:
                enc[x] = (int(line[x]) - ((left + up) >> 1)) & 0xFF
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left
                    if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else ul)
                )
                enc[x] = (int(line[x]) - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _gradient(h: int, w: int, nch: int) -> np.ndarray:
    return (
        (np.arange(h)[:, None, None] * 31 + np.arange(w)[None, :, None] * 7
         + np.arange(nch)[None, None, :] * 3)
        % 256
    ).astype(np.uint8)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_rgb_roundtrip_all_filters(filters):
    px = _gradient(7, 5, 3)
    w, h, got = _decode_png(_png(px, 2, filters))
    assert (w, h) == (5, 7)
    assert np.array_equal(got, px)


def test_png_gray_palette_and_alpha_types():
    g = _gradient(4, 6, 1)
    w, h, got = _decode_png(_png(g, 0, [0, 2]))
    assert (w, h) == (6, 4) and np.array_equal(got, np.repeat(g, 3, axis=2))
    rgba = _gradient(4, 6, 4)
    w, h, got = _decode_png(_png(rgba, 6, [1, 4]))
    assert np.array_equal(got, rgba[:, :, :3])


def test_png_palette():
    pal = np.array([[250, 1, 2], [3, 4, 5], [6, 7, 8]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    png = _png(idx, 3, [0])
    # splice a PLTE chunk before IDAT
    head, idat = png.split(b"IDAT", 1)
    ln = struct.unpack(">I", head[-4:])[0]  # IDAT length prefix
    png = head[:-4] + _chunk(b"PLTE", pal.tobytes()) + struct.pack(">I", ln) + b"IDAT" + idat
    w, h, got = _decode_png(png)
    assert np.array_equal(got, pal[idx[:, :, 0]])


def _bmp24(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y][:, ::-1].reshape(-1).tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
        + body
    )


def test_bmp24_roundtrip():
    px = _gradient(5, 3, 3)
    w, h, got = _decode_bmp24(_bmp24(px))
    assert (w, h) == (3, 5)
    assert np.array_equal(got, px)


def test_real_decoder_feature_contract_and_gate():
    dec = _RealDecoder()
    px = np.full((8, 8, 3), 255, dtype=np.uint8)
    w, h, feat = dec.decode_image(_png(px, 2, [0]))
    assert (w, h) == (8, 8)
    assert feat.shape == (8,) and feat.dtype == np.float32
    assert np.allclose(feat, 1.0)  # all-white -> unit luminance everywhere
    with pytest.raises(ValueError):
        dec.decode_image(b"II*\x00 not a tiff")  # corrupt TIFF structure
    with pytest.raises(NotImplementedError):
        dec.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")  # no codec


def _wav16(rate: int, n_ch: int, samples: np.ndarray) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm_decode():
    dec = _RealDecoder()
    # 1 second of a full-scale square wave, stereo 16kHz: RMS = 32767
    n = 16000 * 2
    sq = np.where(np.arange(n) % 2 == 0, 32767, -32767)
    got = dec.decode_audio(_wav16(16000, 2, sq))
    assert got == {
        "sample_rate": 16000,
        "n_channels": 2,
        "duration_ms": 1000,
        "loudness": 100,
    }
    # silence -> loudness 0; odd-length chunk padding honored
    got = dec.decode_audio(_wav16(8000, 1, np.zeros(4000, dtype=np.int16)))
    assert got["loudness"] == 0 and got["duration_ms"] == 500
    with pytest.raises(NotImplementedError):
        dec.decode_audio(b"ID3\x04 mp3 bytes")


def test_wav_through_spark_plumbing_and_fake_unchanged(spark):
    from invoice_ocr_reconciler_spark.operators.multimodal import (
        audio_features,
    )

    wav = _wav16(22050, 1, np.full(22050, 16384, dtype=np.int16))
    media = spark.createDataFrame(
        [("a1", "audio", bytearray(wav), None)],
        "media_id string, kind string, payload binary, "
        "meta map<string,string>",
    )
    row = audio_features(media, fake=False).collect()[0]
    assert (row.sample_rate, row.n_channels, row.duration_ms) == (
        22050, 1, 1000,
    )
    assert row.loudness == 50 and row.n_bytes == len(wav)
    # fake path (oracle-replayed) unchanged by the real decoder
    import hashlib

    fr = audio_features(media, fake=True).collect()[0]
    h = hashlib.md5(wav).digest()
    assert fr.n_channels == 1 + (h[3] % 2)


def test_real_path_through_spark_plumbing(spark):
    """fake=False flows through the same mapInPandas plumbing."""
    from invoice_ocr_reconciler_spark.operators.multimodal import (
        image_features,
    )

    png = _png(_gradient(6, 4, 3), 2, [0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [("m1", "image", bytearray(png), None)],
        "media_id string, kind string, payload binary, "
        "meta map<string,string>",
    )
    row = image_features(media, fake=False).collect()[0]
    assert (row.width, row.height, row.n_bytes) == (4, 6, len(png))
    assert len(row.feature) == 8


def test_fake_path_unchanged(spark):
    """The oracle-replayed fake path must not shift with the real codec."""
    from invoice_ocr_reconciler_spark.operators.multimodal import (
        image_features,
    )

    media = spark.createDataFrame(
        [("m1", "image", bytearray(b"payload-bytes"), None)],
        "media_id string, kind string, payload binary, "
        "meta map<string,string>",
    )
    row = image_features(media, fake=True).collect()[0]
    import hashlib

    hh = hashlib.md5(b"payload-bytes").digest()
    assert row.width == 64 + hh[0] % 192 and row.height == 64 + hh[1] % 192


# --- baseline JPEG (handcrafted per ITU-T T.81, no codec library) ---

from invoice_ocr_reconciler_spark.operators.multimodal import _decode_jpeg  # noqa: E402

# tiny custom Huffman tables (canonical, Annex C): enough symbols for the
# fixtures — DC categories 0..11, AC (EOB, 0/1, 1/1, ZRL, 0/2)
_DC_COUNTS = [0, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0]
_DC_SYMS = bytes(range(12))
_AC_COUNTS = [0, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMS = bytes([0x00, 0x01, 0x11, 0xF0, 0x02])


def _huff_codes(counts, syms):
    code, k, out = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[syms[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def done(self):
        while self.nbits:
            self.bits(1, 1)  # pad with 1s (T.81 F.1.2.3)
        return bytes(self.out)


def _cat(v):
    s, a = 0, abs(v)
    while a:
        s += 1
        a >>= 1
    return s


def _enc_block(bw, dc_diff, ac, dcc, acc):
    """ac: list of (zigzag_pos_run, value) pairs in (run, val) form."""
    s = _cat(dc_diff)
    bw.bits(*reversed(dcc[s]))
    if s:
        bw.bits(dc_diff if dc_diff >= 0 else dc_diff + (1 << s) - 1, s)
    for run, val in ac:
        s = _cat(val)
        bw.bits(*reversed(acc[(run << 4) | s]))
        bw.bits(val if val >= 0 else val + (1 << s) - 1, s)
    bw.bits(*reversed(acc[0x00]))  # EOB


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_fixture(w, h, comps, entropy, qt=None, dri=0, sof=0xC0):
    """comps: [(cid, hsamp, vsamp)]; entropy: raw ECS bytes (with RSTs)."""
    qt = qt if qt is not None else bytes([1] * 64)
    out = b"\xff\xd8"
    out += _seg(0xDB, b"\x00" + qt)
    sofb = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sofb += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(sof, sofb)
    out += _seg(0xC4, b"\x00" + bytes(_DC_COUNTS) + _DC_SYMS)
    out += _seg(0xC4, b"\x10" + bytes(_AC_COUNTS) + _AC_SYMS)
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sosb = bytes([len(comps)])
    for cid, _, _ in comps:
        sosb += bytes([cid, 0x00])
    sosb += b"\x00\x3f\x00"
    out += _seg(0xDA, sosb)
    return out + entropy + b"\xff\xd9"


def _codes():
    return _huff_codes(_DC_COUNTS, _DC_SYMS), _huff_codes(_AC_COUNTS, _AC_SYMS)


def test_jpeg_gray_dc_only_flat():
    dcc, acc = _codes()
    bw = _BitWriter()
    _enc_block(bw, 16, [], dcc, acc)  # dc=16, q=4 -> coef 64 -> flat 8+128
    jpg = _jpeg_fixture(8, 8, [(1, 1, 1)], bw.done(), qt=bytes([4] * 64))
    w, h, px = _decode_jpeg(jpg)
    assert (w, h) == (8, 8)
    assert px.shape == (8, 8, 3)
    assert np.all(px == 136)


def test_jpeg_gray_single_ac_matches_independent_idct():
    # one AC coefficient at zigzag k=1 (natural (0,1)); expected pixels
    # computed with an explicit double-loop IDCT (independent of the
    # decoder's matrix formulation)
    import math

    dcc, acc = _codes()
    bw = _BitWriter()
    _enc_block(bw, 0, [(0, 3)], dcc, acc)
    jpg = _jpeg_fixture(8, 8, [(1, 1, 1)], bw.done())
    w, h, px = _decode_jpeg(jpg)

    def idct_point(x, y):
        total = 0.0
        for u in range(8):
            for v in range(8):
                f = 3.0 if (u, v) == (0, 1) else 0.0  # F[row u=0][col v=1]
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                total += (
                    cu * cv * f
                    * math.cos((2 * y + 1) * u * math.pi / 16)
                    * math.cos((2 * x + 1) * v * math.pi / 16)
                )
        return total / 4.0

    exp = np.clip(
        np.round([[idct_point(x, y) + 128 for x in range(8)] for y in range(8)]),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(px[:, :, 0], exp)


def test_jpeg_restart_resets_dc_prediction():
    dcc, acc = _codes()
    bw = _BitWriter()
    _enc_block(bw, 16, [], dcc, acc)
    first = bw.done()
    bw2 = _BitWriter()
    _enc_block(bw2, 8, [], dcc, acc)  # after RST0 the predictor resets
    entropy = first + b"\xff\xd0" + bw2.done()
    jpg = _jpeg_fixture(
        16, 8, [(1, 1, 1)], entropy, qt=bytes([4] * 64), dri=1
    )
    w, h, px = _decode_jpeg(jpg)
    assert (w, h) == (16, 8)
    assert np.all(px[:, :8] == 136)  # 16*4/8 + 128
    assert np.all(px[:, 8:] == 132)  # 8*4/8 + 128 (reset, not 136+4)


def test_jpeg_420_color_flat_mcu():
    # 16x16, Y sampled 2x2 + flat chroma: tests MCU interleave order,
    # chroma upsampling, and the JFIF YCbCr->RGB formula
    dcc, acc = _codes()
    bw = _BitWriter()
    for blk in range(4):  # 4 Y blocks: dc diffs 416, 0, 0, 0 -> Y=180
        _enc_block(bw, 416 if blk == 0 else 0, [], dcc, acc)
    _enc_block(bw, -224, [], dcc, acc)  # Cb: 128 - 28 = 100
    _enc_block(bw, 576, [], dcc, acc)   # Cr: 128 + 72 = 200
    jpg = _jpeg_fixture(
        16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], bw.done()
    )
    w, h, px = _decode_jpeg(jpg)
    assert (w, h) == (16, 16)
    y, cb, cr = 180.0, 100.0, 200.0
    exp = np.clip(
        np.round([
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ]),
        0, 255,
    ).astype(np.uint8)
    assert np.all(px == exp[None, None, :])


def test_jpeg_unsupported_and_corrupt_raise():
    dcc, acc = _codes()
    bw = _BitWriter()
    _enc_block(bw, 16, [], dcc, acc)
    good = _jpeg_fixture(8, 8, [(1, 1, 1)], bw.done())
    # SOF2 is SUPPORTED as of round 5 (see the progressive tests below);
    # the still-unimplemented frame types keep raising
    with pytest.raises(NotImplementedError, match="SOF3"):
        _decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc3"))
    with pytest.raises(ValueError):
        _decode_jpeg(b"\xff\xd8\xff\xe0 not a png")  # truncated APP0
    dec = _RealDecoder()
    w, h, feat = dec.decode_image(good)  # routed through the real gate
    assert (w, h) == (8, 8) and feat.shape == (8,)
    assert np.allclose(feat, 130.0 / 255.0, atol=1e-6)  # q=1: dc 16 -> 2+128


# --- round-5: progressive JPEG (SOF2) --------------------------------------
# Spec-derived fixtures: the same coefficient planes encoded once as
# baseline SOF0 and once as a progressive scan script (spectral selection
# + successive approximation, T.81 G.1.2 — encoder mirrors libjpeg's
# jcphuff ordering: symbol, sign bit, then buffered correction bits).
# Decoding both must give IDENTICAL pixels.

# progressive AC table: EOB-run symbols ((r<<4)|0), ZRL, newly-significant
# ((r<<4)|1) and small first-scan sizes — all at code length 8 (canonical,
# Kraft-satisfying, decoder-agnostic)
_PAC_SYMS = bytes(
    [0x00, 0x10, 0x20, 0x30, 0xF0]
    + [(r << 4) | s for r in range(16) for s in (1, 2, 3)]
)
_PAC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_PAC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]


def _pac_codes():
    return _huff_codes(_PAC_COUNTS, _PAC_SYMS)


def _zz_to_pairs(zz):
    """zigzag int array -> baseline (run, val) AC pairs (no ZRL needed in
    these fixtures: runs stay < 16)."""
    pairs, run = [], 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        assert run < 16, "fixture AC run needs ZRL"
        pairs.append((run, int(zz[k])))
        run = 0
    return pairs


def _enc_dc_first(bw, blocks, al, dcc):
    pred = 0
    for zz in blocks:
        v = int(zz[0]) >> al  # arithmetic shift, like libjpeg's DC path
        diff = v - pred
        pred = v
        s = _cat(diff)
        bw.bits(*reversed(dcc[s]))
        if s:
            bw.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(bw, blocks, al):
    for zz in blocks:
        bw.bits((abs(int(zz[0])) >> al) & 1, 1)


def _enc_ac_first(bw, blocks, ss, se, al, acc):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            bw.bits(*reversed(acc[r << 4]))
            if r:
                bw.bits(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        run = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            mag = (abs(v)) >> al  # magnitude shift (jcphuff AC path)
            if mag == 0:
                run += 1
                continue
            flush()
            while run > 15:
                bw.bits(*reversed(acc[0xF0]))
                run -= 16
            s = mag.bit_length()
            bw.bits(*reversed(acc[(run << 4) | s]))
            sv = mag if v >= 0 else -mag
            bw.bits(sv if sv >= 0 else sv + (1 << s) - 1, s)
            run = 0
        if run > 0:
            eobrun += 1
    flush()


def _enc_ac_refine(bw, blocks, ss, se, al, acc):
    eobrun = 0
    br = []  # correction bits deferred with the pending EOB run

    def flush():
        nonlocal eobrun, br
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            bw.bits(*reversed(acc[r << 4]))
            if r:
                bw.bits(eobrun - (1 << r), r)
        for b in br:
            bw.bits(b, 1)
        eobrun, br = 0, []

    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(64)]
        run, cur = 0, []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                run += 1
                continue
            if t > 1:  # nonzero history: one correction bit
                cur.append(t & 1)
                continue
            # newly significant at this precision
            flush()
            while run > 15:
                bw.bits(*reversed(acc[0xF0]))
                for b in cur:
                    bw.bits(b, 1)
                cur = []
                run -= 16
            bw.bits(*reversed(acc[(run << 4) | 1]))
            bw.bits(1 if int(zz[k]) > 0 else 0, 1)
            for b in cur:
                bw.bits(b, 1)
            cur, run = [], 0
        if run > 0 or cur:
            eobrun += 1
            br.extend(cur)
    flush()


def _jpeg_prog_fixture(w, h, comps, scans, qt=None, sof=0xC2):
    """Multi-scan fixture (SOF2 by default; sof=0xC0 builds the baseline
    twin with the SAME Huffman tables). scans: [(sel_cids, ss, se, ah,
    al, ecs_bytes)] — DC table 0 + rich AC table 0 shared by every
    scan."""
    qt = qt if qt is not None else bytes([1] * 64)
    out = b"\xff\xd8"
    out += _seg(0xDB, b"\x00" + qt)
    sofb = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sofb += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(sof, sofb)
    out += _seg(0xC4, b"\x00" + bytes(_DC_COUNTS) + _DC_SYMS)
    out += _seg(0xC4, b"\x10" + bytes(_PAC_COUNTS) + _PAC_SYMS)
    for cids, ss, se, ah, al, ecs in scans:
        sosb = bytes([len(cids)])
        for cid in cids:
            sosb += bytes([cid, 0x00])
        sosb += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sosb) + ecs
    return out + b"\xff\xd9"


def _prog_gray_blocks():
    """Three 8x8 blocks with structure exercising every scan type:
    odd/even DCs (refine bits 1/0), negative DC (floor shift), refinement
    corrections on existing coefs, a newly-significant coef behind >16
    zero-history positions (ZRL in refinement), and an EOB run spanning
    the trailing two blocks of the high band."""
    b0 = np.zeros(64, dtype=np.int64)
    b0[0], b0[1], b0[4], b0[20], b0[35] = 21, 5, -3, 1, 2
    b1 = np.zeros(64, dtype=np.int64)
    b1[0], b1[2], b1[19] = -9, 7, -1
    b2 = np.zeros(64, dtype=np.int64)
    b2[0], b2[3] = 12, 3
    return [b0, b1, b2]


def _prog_gray_fixture(blocks, qt):
    dcc, acc = _huff_codes(_DC_COUNTS, _DC_SYMS), _pac_codes()
    scans = []
    for enc, args in (
        (_enc_dc_first, (blocks, 1, dcc)),
        (_enc_dc_refine, (blocks, 0)),
    ):
        bw = _BitWriter()
        enc(bw, *args)
        ss_se_ah_al = (0, 0, 0, 1) if enc is _enc_dc_first else (0, 0, 1, 0)
        scans.append(([1], *ss_se_ah_al, bw.done()))
    for ss, se, ah, al, enc in (
        (1, 20, 0, 1, _enc_ac_first),
        (21, 63, 0, 1, _enc_ac_first),
        (1, 20, 1, 0, _enc_ac_refine),
        (21, 63, 1, 0, _enc_ac_refine),
    ):
        bw = _BitWriter()
        enc(bw, blocks, ss, se, al, acc)
        scans.append(([1], ss, se, ah, al, bw.done()))
    return _jpeg_prog_fixture(24, 8, [(1, 1, 1)], scans, qt=qt)


def test_jpeg_progressive_gray_matches_baseline():
    blocks = _prog_gray_blocks()
    qt = bytes([2] * 64)
    # baseline twin: same coefficients, sequential encoding, same tables
    dcc, acc = _huff_codes(_DC_COUNTS, _DC_SYMS), _pac_codes()
    bw = _BitWriter()
    pred = 0
    for zz in blocks:
        pairs = []
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                pairs.append((15, 0))  # ZRL
                run -= 16
            pairs.append((run, int(zz[k])))
            run = 0
        _enc_block_zrl(bw, int(zz[0]) - pred, pairs, dcc, acc)
        pred = int(zz[0])
    base = _jpeg_prog_fixture(
        24, 8, [(1, 1, 1)], [([1], 0, 63, 0, 0, bw.done())], qt=qt,
        sof=0xC0,
    )
    prog = _prog_gray_fixture(blocks, qt)
    wb, hb, pb = _decode_jpeg(base)
    wp, hp, pp = _decode_jpeg(prog)
    assert (wb, hb) == (wp, hp) == (24, 8)
    assert np.array_equal(pb, pp)
    # the progressive stream is not trivially the baseline one
    assert base != prog and b"\xff\xc2" in prog


def _enc_block_zrl(bw, dc_diff, ac, dcc, acc):
    """_enc_block with ZRL pairs allowed ((15, 0) entries)."""
    s = _cat(dc_diff)
    bw.bits(*reversed(dcc[s]))
    if s:
        bw.bits(dc_diff if dc_diff >= 0 else dc_diff + (1 << s) - 1, s)
    for run, val in ac:
        if (run, val) == (15, 0):
            bw.bits(*reversed(acc[0xF0]))
            continue
        s = _cat(val)
        bw.bits(*reversed(acc[(run << 4) | s]))
        bw.bits(val if val >= 0 else val + (1 << s) - 1, s)
    bw.bits(*reversed(acc[0x00]))  # EOB


def test_jpeg_progressive_420_color_interleaved_dc():
    """Interleaved DC scan (3 components, 4:2:0) + per-component AC
    scans on the NON-padded block geometry; flat chroma, per-block luma
    structure. Must equal the baseline 4:2:0 twin pixel-for-pixel."""
    qt = bytes([2] * 64)
    dcc = _huff_codes(_DC_COUNTS, _DC_SYMS)
    acc = _pac_codes()
    # 16x16 frame, 4:2:0: luma 4 blocks (2x2), each chroma 1 block
    luma = []
    for i, dc in enumerate((24, -8, 13, 40)):
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = dc
        zz[1 + i] = 4 + i  # one AC coef at a distinct zigzag slot
        luma.append(zz)
    cb = [np.zeros(64, dtype=np.int64)]
    cb[0][0] = 6
    cr = [np.zeros(64, dtype=np.int64)]
    cr[0][0] = -10
    # interleaved DC first scan: MCU order = 4 luma blocks, then cb, cr
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for cid, zz in [(1, luma[0]), (1, luma[1]), (1, luma[2]), (1, luma[3]),
                    (2, cb[0]), (3, cr[0])]:
        v = int(zz[0])
        diff = v - preds[cid]
        preds[cid] = v
        s = _cat(diff)
        bw.bits(*reversed(dcc[s]))
        if s:
            bw.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
    scans = [([1, 2, 3], 0, 0, 0, 0, bw.done())]
    for cid, blocks in ((1, luma), (2, cb), (3, cr)):
        bw = _BitWriter()
        _enc_ac_first(bw, blocks, 1, 63, 0, acc)
        scans.append(([cid], 1, 63, 0, 0, bw.done()))
    prog = _jpeg_prog_fixture(
        16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], scans, qt=qt
    )
    # baseline twin: same tables as the progressive stream
    bw = _BitWriter()
    predb = {1: 0, 2: 0, 3: 0}
    for cid, zz in [(1, luma[0]), (1, luma[1]), (1, luma[2]), (1, luma[3]),
                    (2, cb[0]), (3, cr[0])]:
        _enc_block(bw, int(zz[0]) - predb[cid], _zz_to_pairs(zz), dcc, acc)
        predb[cid] = int(zz[0])
    base = _jpeg_prog_fixture(
        16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
        [([1, 2, 3], 0, 63, 0, 0, bw.done())], qt=qt, sof=0xC0,
    )
    wb, hb, pb = _decode_jpeg(base)
    wp, hp, pp = _decode_jpeg(prog)
    assert (wb, hb) == (wp, hp) == (16, 16)
    assert np.array_equal(pb, pp)


def test_jpeg_progressive_through_real_gate():
    """The progressive stream decodes through the SAME _RealDecoder gate
    (feature contract identical to every other format)."""
    blocks = _prog_gray_blocks()
    prog = _prog_gray_fixture(blocks, bytes([2] * 64))
    dec = _RealDecoder()
    w, h, feat = dec.decode_image(prog)
    assert (w, h) == (24, 8) and feat.shape == (8,)
    assert np.all((feat >= 0.0) & (feat <= 1.0))


def test_jpeg_progressive_refinement_size_guard():
    """An AC-refinement scan whose Huffman stream claims s=2 is corrupt
    (refinement sizes must be 1) -- ValueError, not silent garbage."""
    acc = _pac_codes()
    bw = _BitWriter()
    bw.bits(*reversed(acc[0x02]))  # s=2 in a refinement scan
    bw.bits(3, 2)
    jpg = _jpeg_prog_fixture(
        8, 8, [(1, 1, 1)],
        [([1], 0, 0, 0, 0, _BitWriter().done() if False else _dc_zero_ecs()),
         ([1], 1, 63, 1, 0, bw.done())],
    )
    with pytest.raises(ValueError, match="refinement"):
        _decode_jpeg(jpg)


def _dc_zero_ecs():
    dcc = _huff_codes(_DC_COUNTS, _DC_SYMS)
    bw = _BitWriter()
    bw.bits(*reversed(dcc[0]))  # one block, diff 0
    return bw.done()


# --- round-5: baseline TIFF ------------------------------------------------


def _lzw_enc(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (early change) for fixtures."""
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    put(256, width)  # Clear
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1  # early change
        elif nxt == 4094:  # table full: Clear + reset (TIFF 6.0 rule)
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        prev = bytes([b])
    if prev:
        put(table[prev], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_enc(data: bytes) -> bytes:
    """Simple PackBits encoder: runs of >=3 as repeats, else literals."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and (i - lit) < 128:
            run = 1
            while i + run < n and data[i + run] == data[i] and run < 128:
                run += 1
            if run >= 3:
                break
            i += run
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _tiff(px, photo, comp=1, end="<", predictor=1, rows_per_strip=None,
          cmap=None, spp=None):
    """Minimal strip-based TIFF writer for fixtures. px: (h, w) gray /
    palette indices or (h, w, spp) array."""
    h, w = px.shape[:2]
    spp = spp if spp is not None else (1 if px.ndim == 2 else px.shape[2])
    rps = rows_per_strip or h
    raw = px.astype(np.uint8)
    if predictor == 2:
        d = raw.astype(np.int16).reshape(h, w, spp)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        raw = (d % 256).astype(np.uint8)
    rowb = raw.reshape(h, -1).tobytes()
    strips = []
    for s0 in range(0, h, rps):
        chunk = raw.reshape(h, -1)[s0 : s0 + rps].tobytes()
        if comp == 5:
            chunk = _lzw_enc(chunk)
        elif comp == 32773:
            chunk = _packbits_enc(chunk)
        strips.append(chunk)

    tags = []  # (tag, type, count, values)
    tags.append((256, 4, 1, [w]))
    tags.append((257, 4, 1, [h]))
    tags.append((258, 3, spp, [8] * spp))
    tags.append((259, 3, 1, [comp]))
    tags.append((262, 3, 1, [photo]))
    tags.append((277, 3, 1, [spp]))
    tags.append((278, 4, 1, [rps]))
    if predictor != 1:
        tags.append((317, 3, 1, [predictor]))
    if cmap is not None:
        tags.append((320, 3, len(cmap), cmap))

    # layout: header(8) + IFD + ext values + strip data
    n_tags = len(tags) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    ext = bytearray()
    ext_base = ifd_off + ifd_size

    def enc_vals(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(end + fmt, v) for v in vals)

    entries = []

    def add(tag_id, typ, cnt, vals):
        data = enc_vals(typ, vals)
        if len(data) <= 4:
            entries.append((tag_id, typ, cnt, data.ljust(4, b"\0"), None))
        else:
            entries.append((tag_id, typ, cnt, None, bytes(data)))

    for t, ty, c, v in tags:
        add(t, ty, c, v)
    # strip tables (resolve offsets after ext sizing: two passes)
    strip_cnt = len(strips)
    add(273, 4, strip_cnt, [0] * strip_cnt)  # placeholder
    add(279, 4, strip_cnt, [len(s) for s in strips])
    # first pass: compute ext layout
    ext_offs = []
    off = ext_base
    for _t, _ty, _c, inline, extdata in entries:
        if extdata is not None:
            ext_offs.append(off)
            off += len(extdata)
        else:
            ext_offs.append(None)
    data_base = off
    strip_offs = []
    so = data_base
    for s in strips:
        strip_offs.append(so)
        so += len(s)
    # rewrite the StripOffsets entry with real values
    for i, (t, ty, c, inline, extdata) in enumerate(entries):
        if t == 273:
            data = enc_vals(ty, strip_offs)
            if len(data) <= 4:
                entries[i] = (t, ty, c, data.ljust(4, b"\0"), None)
            else:
                entries[i] = (t, ty, c, None, bytes(data))
    # ext layout may shift if 273 flipped inline/ext -- strip count is
    # fixed per fixture, so inline-ness is stable; assert it
    out = bytearray()
    out += (b"II" if end == "<" else b"MM") + struct.pack(end + "HI", 42, 8)
    out += struct.pack(end + "H", n_tags)
    ei = 0
    for (t, ty, c, inline, extdata), eoff in zip(entries, ext_offs):
        out += struct.pack(end + "HHI", t, ty, c)
        if extdata is not None:
            out += struct.pack(end + "I", eoff)
        else:
            out += inline
        ei += 1
    out += struct.pack(end + "I", 0)  # no next IFD
    for (_t, _ty, _c, inline, extdata) in entries:
        if extdata is not None:
            out += extdata
    for s in strips:
        out += s
    return bytes(out)


def _tiff_px(h, w, spp):
    rng = np.random.default_rng(42)
    if spp == 1:
        return rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return rng.integers(0, 256, size=(h, w, spp), dtype=np.uint8)


def test_tiff_gray_both_photometrics_and_endians():
    from invoice_ocr_reconciler_spark.operators.multimodal import _decode_tiff

    px = _tiff_px(5, 7, 1)
    for end in ("<", ">"):
        w, h, rgb = _decode_tiff(_tiff(px, photo=1, end=end))
        assert (w, h) == (7, 5)
        assert np.array_equal(rgb[:, :, 0], px)
        w, h, rgb0 = _decode_tiff(_tiff(px, photo=0, end=end))
        assert np.array_equal(rgb0[:, :, 0], 255 - px)


def test_tiff_rgb_rgba_and_palette():
    from invoice_ocr_reconciler_spark.operators.multimodal import _decode_tiff

    px = _tiff_px(4, 6, 3)
    w, h, rgb = _decode_tiff(_tiff(px, photo=2))
    assert np.array_equal(rgb, px)
    # RGBA: alpha dropped
    px4 = _tiff_px(4, 6, 4)
    w, h, rgb = _decode_tiff(_tiff(px4, photo=2))
    assert np.array_equal(rgb, px4[:, :, :3])
    # palette: 16-bit colormap entries, high byte is the 8-bit value
    idx = _tiff_px(3, 5, 1)
    cmap = list(range(256)) * 3  # r[i]=g[i]=b[i]=i (as 16-bit <<8)
    cmap = [(v << 8) for v in cmap]
    w, h, rgb = _decode_tiff(_tiff(idx, photo=3, cmap=cmap))
    assert np.array_equal(rgb[:, :, 0], idx)
    assert np.array_equal(rgb[:, :, 1], idx)


def test_tiff_packbits_lzw_predictor_multistrip():
    from invoice_ocr_reconciler_spark.operators.multimodal import _decode_tiff

    # runs + noise exercise both PackBits branches
    px = _tiff_px(6, 8, 3)
    px[0:2] = 17
    w, h, rgb = _decode_tiff(_tiff(px, photo=2, comp=32773, rows_per_strip=2))
    assert np.array_equal(rgb, px)
    w, h, rgb = _decode_tiff(_tiff(px, photo=2, comp=5, rows_per_strip=3))
    assert np.array_equal(rgb, px)
    # LZW + horizontal-differencing predictor
    w, h, rgb = _decode_tiff(
        _tiff(px, photo=2, comp=5, predictor=2, rows_per_strip=6)
    )
    assert np.array_equal(rgb, px)
    # big gradient stresses the LZW width bumps past 9 bits
    big = np.tile(np.arange(256, dtype=np.uint8), (4, 2))
    w, h, rgb = _decode_tiff(_tiff(big, photo=1, comp=5))
    assert np.array_equal(rgb[:, :, 0], big)
    # random 100x300 crosses the 12-bit width cap AND the mid-stream
    # Clear reset (table full at 4094 -> encoder Clear, decoder resync)
    deep = _tiff_px(100, 300, 1)
    w, h, rgb = _decode_tiff(_tiff(deep, photo=1, comp=5))
    assert np.array_equal(rgb[:, :, 0], deep)


def test_tiff_unsupported_raise_and_gate():
    from invoice_ocr_reconciler_spark.operators.multimodal import (
        _RealDecoder,
        _decode_tiff,
    )

    px = _tiff_px(4, 4, 1)
    good = _tiff(px, photo=1)
    with pytest.raises(ValueError):
        _decode_tiff(b"II\x2b\x00" + good[4:])  # BigTIFF magic
    # 16-bit declaration raises honestly
    bad16 = good.replace(
        struct.pack("<HHI", 258, 3, 1) + struct.pack("<H", 8).ljust(4, b"\0"),
        struct.pack("<HHI", 258, 3, 1) + struct.pack("<H", 16).ljust(4, b"\0"),
    )
    with pytest.raises(NotImplementedError, match="bits-per-sample"):
        _decode_tiff(bad16)
    dec = _RealDecoder()
    w, h, feat = dec.decode_image(good)
    assert (w, h) == (4, 4) and feat.shape == (8,)
