"""util/jpeg.py — pure-Python baseline grayscale JPEG codec.

No Pillow exists in this environment, so validation is (a) bit-exact
round trips on the DC-only class (solid gray at q75 — the p62 oracle
anchor's property), (b) reconstruction-error bounds on general content,
(c) container structure pinned against the ITU-T T.81 spec (marker
layout, Annex-K tables in the emitted DQT/DHT, byte stuffing), and
(d) the format-error contracts (progressive/color/truncation raise)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from duckdb_cloudflare_spark.util import jpeg as J


class TestRoundTrip:
    @pytest.mark.parametrize("v", [0, 1, 77, 128, 200, 255])
    @pytest.mark.parametrize("dims", [(8, 8), (16, 8), (24, 16), (13, 9)])
    def test_solid_gray_q75_bit_exact(self, v, dims):
        # Solid gray at q75: only coefficient is DC = 8*(v-128) and the
        # scaled Annex-K table has Q[0,0] = 8, so quantization is lossless
        # — decode(encode(img)) must be bit-identical (incl. non-multiple-
        # of-8 dims, which exercise pad + crop).
        w, h = dims
        px = bytes([v]) * (w * h)
        w2, h2, rec = J.decode_jpeg(J.encode_jpeg(px, w, h, 75))
        assert (w2, h2) == (w, h)
        assert rec == px

    def test_two_blocks_different_grays_exact(self):
        # Adjacent blocks with different DCs: exercises the DC-difference
        # chain (not just a constant predictor).
        img = np.zeros((8, 16), dtype=np.uint8)
        img[:, :8], img[:, 8:] = 100, 228
        w2, h2, rec = J.decode_jpeg(J.encode_jpeg(img.tobytes(), 16, 8, 75))
        assert rec == img.tobytes()

    def test_smooth_gradient_error_bound(self):
        img = np.clip(
            np.add.outer(np.arange(32) * 4, np.arange(40) * 3), 0, 255
        ).astype(np.uint8)
        w2, h2, rec = J.decode_jpeg(J.encode_jpeg(img.tobytes(), 40, 32, 90))
        err = np.abs(
            np.frombuffer(rec, np.uint8).astype(int) - img.reshape(-1).astype(int)
        )
        assert err.max() <= 10 and err.mean() <= 3

    def test_noise_survives_and_is_bounded(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        w2, h2, rec = J.decode_jpeg(J.encode_jpeg(img.tobytes(), 24, 24, 95))
        err = np.abs(
            np.frombuffer(rec, np.uint8).astype(int) - img.reshape(-1).astype(int)
        )
        assert err.max() <= 40  # noise is the worst case for DCT coding

    def test_quality_monotonic(self):
        # Higher quality → (weakly) lower reconstruction error.
        rng = np.random.default_rng(3)
        img = (
            128 + 60 * np.sin(np.add.outer(np.arange(16), np.arange(16)) / 3)
            + rng.integers(0, 4, (16, 16))
        ).astype(np.uint8)
        errs = []
        for q in (30, 60, 90):
            _, _, rec = J.decode_jpeg(J.encode_jpeg(img.tobytes(), 16, 16, q))
            errs.append(
                np.abs(
                    np.frombuffer(rec, np.uint8).astype(int)
                    - img.reshape(-1).astype(int)
                ).mean()
            )
        assert errs[0] >= errs[1] >= errs[2]


class TestContainer:
    def test_marker_layout_and_annex_k_tables(self):
        blob = J.encode_jpeg(bytes([9]) * 64, 8, 8, 50)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
        # DQT at q50 must carry the UNSCALED Annex-K luminance table, in
        # zigzag order (zigzag[1] is Q[0,1]=11, zigzag[2] is Q[1,0]=12).
        i = blob.index(b"\xff\xdb")
        table = blob[i + 5 : i + 69]
        assert table[0] == 16 and table[1] == 11 and table[2] == 12
        # DHT carries the Annex-K typical luminance DC then AC tables.
        i = blob.index(b"\xff\xc4")
        assert list(blob[i + 5 : i + 21]) == J._DC_BITS
        # SOF0: 8-bit precision, 8x8, one component, 1x1 sampling.
        i = blob.index(b"\xff\xc0")
        prec, h, w, n = struct.unpack(">BHHB", blob[i + 4 : i + 10])
        assert (prec, h, w, n) == (8, 8, 8, 1) and blob[i + 11] == 0x11

    def test_byte_stuffing_in_scan(self):
        # Find an image whose entropy stream contains a 0xFF byte: it must
        # be followed by 0x00 (stuffing), and decode must still round-trip.
        for seed in range(40):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
            blob = J.encode_jpeg(img.tobytes(), 16, 16, 85)
            i = blob.index(b"\xff\xda")
            scan = blob[i + 2 + struct.unpack(">H", blob[i + 2 : i + 4])[0] : -2]
            if b"\xff" in scan:
                assert b"\xff\x00" in scan
                w2, h2, _ = J.decode_jpeg(blob)
                assert (w2, h2) == (16, 16)
                return
        pytest.fail("no 0xFF byte produced in 40 seeds — stuffing untested")

    def test_meta_probe_reads_header_only(self):
        blob = J.encode_jpeg(bytes([7]) * (24 * 16), 24, 16)
        # Corrupt the entropy stream: the header probe must still answer.
        broken = blob[:-10] + b"\x00" * 8 + blob[-2:]
        assert J.jpeg_meta(broken) == (24, 16, 1)

    def test_zigzag_is_the_spec_order(self):
        # First diagonal walk of the spec's zigzag: 0,1,8,16,9,2,3,10 ...
        assert list(J._ZIGZAG[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
        assert sorted(J._ZIGZAG) == list(range(64))

    def test_canonical_dc_codes(self):
        # Annex-K DC luminance: size 0 gets the 2-bit code 00; sizes 1-5
        # get 3-bit codes 010..110 (canonical assignment).
        assert J._DC_CODES[0] == (0b00, 2)
        assert J._DC_CODES[1] == (0b010, 3)
        assert J._DC_CODES[5] == (0b110, 3)
        # AC: EOB is the 4-bit code 1010, ZRL the 11-bit 11111111001.
        assert J._AC_CODES[0x00] == (0b1010, 4)
        assert J._AC_CODES[0xF0] == (0b11111111001, 11)


class TestContracts:
    def test_not_a_jpeg(self):
        with pytest.raises(J.JpegFormatError, match="SOI"):
            J.decode_jpeg(b"\x89PNG\r\n\x1a\nnope")

    def test_progressive_raises(self):
        blob = bytearray(J.encode_jpeg(bytes(64), 8, 8))
        i = blob.index(b"\xff\xc0")
        blob[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
        with pytest.raises(J.JpegFormatError, match="baseline"):
            J.decode_jpeg(bytes(blob))

    def test_multicomponent_raises(self):
        blob = bytearray(J.encode_jpeg(bytes(64), 8, 8))
        i = blob.index(b"\xff\xc0")
        blob[i + 9] = 3  # component count 1 → 3
        with pytest.raises(J.JpegFormatError, match="grayscale"):
            J.decode_jpeg(bytes(blob))

    def test_truncated_scan_raises(self):
        blob = J.encode_jpeg(np.arange(256, dtype=np.uint8).tobytes(), 16, 16, 90)
        with pytest.raises(J.JpegFormatError):
            J.decode_jpeg(blob[: len(blob) // 2])

    def test_wrong_buffer_size_raises(self):
        with pytest.raises(J.JpegFormatError, match="expected"):
            J.encode_jpeg(bytes(63), 8, 8)

    def test_bad_quality_raises(self):
        with pytest.raises(J.JpegFormatError, match="quality"):
            J.encode_jpeg(bytes(64), 8, 8, quality=0)


class TestOperatorWiring:
    def test_asset_meta_recognizes_jpeg(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_asset_meta

        meta = decode_asset_meta(J.encode_jpeg(bytes([5]) * (24 * 8), 24, 8))
        assert meta["mime"] == "image/jpeg"
        assert (meta["width"], meta["height"], meta["channels"]) == (24, 8, 1)
        assert meta["error"] is None

    def test_asset_meta_jpeg_error_as_row(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_asset_meta

        meta = decode_asset_meta(b"\xff\xd8\xff\xc2" + bytes(20))
        assert meta["mime"] is None and "Error" in (meta["error"] or "")

    def test_decode_with_real_codec_routes_jpeg(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_with_real_codec

        px = bytes([42]) * 64
        w, h, c, rec = decode_with_real_codec(J.encode_jpeg(px, 8, 8, 75))
        assert (w, h, c) == (8, 8, 1) and rec == px

    def test_resize_jpeg_roundtrip(self):
        from duckdb_cloudflare_spark.operators.multimodal import _resize_bytes

        blob = J.encode_jpeg(bytes([200]) * (16 * 16), 16, 16, 75)
        out = _resize_bytes(blob, 8, 8)
        w, h, rec = J.decode_jpeg(out)
        assert (w, h) == (8, 8) and rec == bytes([200]) * 64
