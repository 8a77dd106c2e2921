"""Real-codec tests: the pure-Python PNG implementation (util/png.py) on
REAL PNG bytes — encode/decode round trips, every scanline filter type,
CRC/truncation error contracts, and the multimodal operators' PNG paths."""

from __future__ import annotations

import struct
import zlib

import pytest

from duckdb_cloudflare_spark.util import png


def _pixels(w, h, c, seed=0):
    return bytes((seed + i * 31) % 256 for i in range(w * h * c))


class TestRoundTrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_encode_decode_all_color_types(self, channels):
        w, h = 13, 7  # deliberately non-power-of-two
        pix = _pixels(w, h, channels)
        blob = png.encode_png(pix, w, h, channels)
        assert blob[:8] == png.PNG_SIGNATURE
        w2, h2, c2, pix2 = png.decode_png(blob)
        assert (w2, h2, c2) == (w, h, channels)
        assert pix2 == pix

    def test_meta_header_only(self):
        blob = png.encode_png(_pixels(32, 16, 3), 32, 16, 3)
        assert png.png_meta(blob) == (32, 16, 3)

    def test_one_by_one(self):
        blob = png.encode_png(b"\x2a", 1, 1, 1)
        assert png.decode_png(blob) == (1, 1, 1, b"\x2a")


def _hand_encode(width, height, channels, scanlines):
    """Build a PNG whose IDAT carries caller-chosen (filter, rawbytes)
    scanlines — lets us pin decode of filters our encoder never emits."""
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(row) for f, row in scanlines)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        png.PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


class TestFilterReconstruction:
    """Spec §6 Recon() identities, one filter per test, values chosen so
    every branch (left/up/upper-left, modular wrap) is exercised."""

    def test_filter_sub(self):
        # row of 4 gray pixels, Sub-filtered: raw = [10, 10, 10, 250]
        # recon: 10, 20, 30, 280&255=24
        blob = _hand_encode(4, 1, 1, [(1, [10, 10, 10, 250])])
        assert png.decode_png(blob)[3] == bytes([10, 20, 30, 24])

    def test_filter_up(self):
        blob = _hand_encode(3, 2, 1, [(0, [5, 6, 7]), (2, [10, 250, 20])])
        # second row recon: 15, (6+250)&255=0, 27
        assert png.decode_png(blob)[3] == bytes([5, 6, 7, 15, 0, 27])

    def test_filter_average(self):
        # row1 plain, row2 Average: recon[x] = raw + floor((left+up)/2)
        blob = _hand_encode(2, 2, 1, [(0, [8, 16]), (3, [4, 4])])
        # x0: 4 + (0+8)//2 = 8 ; x1: 4 + (8+16)//2 = 16
        assert png.decode_png(blob)[3] == bytes([8, 16, 8, 16])

    def test_filter_paeth(self):
        # Paeth predictor picks nearest of left/up/upper-left
        blob = _hand_encode(2, 2, 1, [(0, [100, 200]), (4, [1, 2])])
        # row2 x0: pred = up(100) → 101; x1: a=101,b=200,c=100 →
        # p=201, pa=100, pb=1, pc=101 → picks b(200) → 202
        assert png.decode_png(blob)[3] == bytes([100, 200, 101, 202])

    def test_multichannel_sub_uses_bpp_offset(self):
        # RGB: Sub's "left" is the same channel one PIXEL back (bpp=3)
        blob = _hand_encode(2, 1, 3, [(1, [10, 20, 30, 1, 2, 3])])
        assert png.decode_png(blob)[3] == bytes([10, 20, 30, 11, 22, 33])


class TestErrorContracts:
    def test_bad_signature(self):
        with pytest.raises(png.PngFormatError, match="signature"):
            png.decode_png(b"NOTAPNG!" + b"\0" * 40)

    def test_crc_mismatch_detected(self):
        blob = bytearray(png.encode_png(_pixels(4, 4, 3), 4, 4, 3))
        blob[40] ^= 0xFF  # flip a byte inside IDAT payload
        with pytest.raises(png.PngFormatError, match="CRC|IDAT"):
            png.decode_png(bytes(blob))

    def test_truncated(self):
        blob = png.encode_png(_pixels(4, 4, 3), 4, 4, 3)
        with pytest.raises(png.PngFormatError):
            png.decode_png(blob[:30])

    def test_unsupported_16bit(self):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
        blob = _hand_encode(1, 1, 1, [(0, [0])])
        # splice a 16-bit IHDR into an otherwise valid stream
        patched = (
            blob[:16] + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
            + blob[16 + 13 + 4 :]
        )
        with pytest.raises(png.PngFormatError, match="bit depth"):
            png.decode_png(patched)

    def test_wrong_pixel_buffer_size_on_encode(self):
        with pytest.raises(png.PngFormatError, match="expected"):
            png.encode_png(b"\0" * 10, 2, 2, 3)

    def test_ancillary_chunks_skipped(self):
        blob = png.encode_png(_pixels(2, 2, 1), 2, 2, 1)
        text = b"Comment\x00hello"
        extra = (
            struct.pack(">I", len(text)) + b"tEXt" + text
            + struct.pack(">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF)
        )
        # insert tEXt between IHDR and IDAT (after sig+IHDR = 8+25 bytes)
        patched = blob[:33] + extra + blob[33:]
        assert png.decode_png(patched)[3] == _pixels(2, 2, 1)


class TestResize:
    def test_nearest_identity(self):
        pix = _pixels(4, 4, 3)
        assert png.resize_nearest(pix, 4, 4, 3, 4, 4) == pix

    def test_nearest_downsample_picks_grid(self):
        # 2x2 gray → 1x1 picks the top-left sample
        pix = bytes([10, 20, 30, 40])
        assert png.resize_nearest(pix, 2, 2, 1, 1, 1) == bytes([10])

    def test_upsample_repeats(self):
        pix = bytes([7])
        assert png.resize_nearest(pix, 1, 1, 1, 2, 2) == bytes([7] * 4)


class TestMultimodalPngPaths:
    """The operators' real-codec branches on real PNG bytes."""

    def test_decode_asset_meta_png(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_asset_meta

        meta = decode_asset_meta(png.encode_png(_pixels(24, 8, 4), 24, 8, 4))
        assert meta["mime"] == "image/png"
        assert (meta["width"], meta["height"], meta["channels"]) == (24, 8, 4)
        assert meta["error"] is None

    def test_decode_with_real_codec_png(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_with_real_codec

        pix = _pixels(5, 3, 3)
        w, h, c, out = decode_with_real_codec(png.encode_png(pix, 5, 3, 3))
        assert (w, h, c, out) == (5, 3, 3, pix)

    def test_resize_image_png_roundtrip(self, spark):
        from duckdb_cloudflare_spark.operators.multimodal import resize_image

        pix = _pixels(8, 8, 3)
        df = spark.createDataFrame(
            [(1, png.encode_png(pix, 8, 8, 3))], "doc_id long, asset binary"
        )
        out = resize_image(df, 4, 4).select("resized").first()["resized"]
        w, h, c, rp = png.decode_png(bytes(out))
        assert (w, h, c) == (4, 4, 3)
        assert rp == png.resize_nearest(pix, 8, 8, 3, 4, 4)

    def test_corrupt_png_is_error_as_row_not_exception(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_asset_meta

        blob = bytearray(png.encode_png(_pixels(4, 4, 3), 4, 4, 3))
        blob[25] = 3  # color type → palette (unsupported subset)
        meta = decode_asset_meta(bytes(blob))
        assert meta["error"] and "Error" in meta["error"]
