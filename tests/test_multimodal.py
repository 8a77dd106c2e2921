"""Multimodal operator tests: container codec round-trip, mapInPandas
schema/batch plumbing, frame-sample explode, resize determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators import multimodal as M


# ---------------------------------------------------------------------------
# Pure codec round-trips (no Spark)
# ---------------------------------------------------------------------------


def test_image_header_roundtrip():
    data = M.encode_fake_image(640, 480, 3, b"payload")
    meta = M.decode_asset_meta(data)
    assert meta["mime"] == "image/fimg"
    assert (meta["width"], meta["height"], meta["channels"]) == (640, 480, 3)
    assert meta["error"] is None


def test_audio_header_roundtrip():
    meta = M.decode_asset_meta(M.encode_fake_audio(16000, 32000, b""))
    assert meta["mime"] == "audio/faud"
    assert meta["sample_rate"] == 16000
    assert meta["n_samples"] == 32000
    assert meta["duration_ms"] == 1000.0 * 32000 / 16000


def test_video_header_roundtrip():
    data = M.encode_fake_video(320, 240, 25, 10)
    meta = M.decode_asset_meta(data)
    assert meta["mime"] == "video/fvid"
    assert meta["n_frames"] == 10
    assert len(data) == M._VID_HDR.size + 10 * M.VIDEO_FRAME_BYTES


def test_decode_errors_land_in_row_not_exception():
    assert M.decode_asset_meta(None)["error"] == "[Error: asset too short]"
    assert M.decode_asset_meta(b"??")["error"] == "[Error: asset too short]"
    assert M.decode_asset_meta(b"NOPE1234")["error"] == "[Error: unknown magic]"
    assert M.decode_asset_meta(M.IMG_MAGIC)["error"] == "[Error: truncated header]"


def test_real_codec_hook_raises_only_without_codec():
    if M.real_codec() is None:
        with pytest.raises(NotImplementedError):
            M.decode_with_real_codec(b"anything")
    else:
        with pytest.raises(Exception):  # garbage bytes, but a real attempt
            M.decode_with_real_codec(b"anything")


@pytest.mark.skipif(M.real_codec() is None, reason="Pillow not installed")
def test_real_codec_path_auto_activates(spark):
    # Auto-activating twin of the Iceberg jar-gated test: when Pillow IS
    # installed, real image bytes must flow through the same Spark plumbing
    # (meta decode + resize) as the synthetic containers.
    import io

    Image = M.real_codec()
    buf = io.BytesIO()
    Image.new("RGB", (8, 6), color=(10, 20, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, asset binary")
    meta = M.with_asset_meta(df).select("meta.*").collect()[0]
    assert (meta["mime"], meta["width"], meta["height"], meta["channels"]) == (
        "image/png", 8, 6, 3,
    )
    resized = M.resize_image(df, 4, 3).select("resized").collect()[0][0]
    with Image.open(io.BytesIO(bytes(resized))) as im:
        assert (im.width, im.height) == (4, 3)


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def assets_df(spark):
    docs = spark.range(0, 30).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text-"), F.col("id")).alias("text")
    )
    return M.attach_fake_assets(docs)


def test_attach_fake_assets_schema(assets_df):
    assert dict(assets_df.dtypes)["asset"] == "binary"


def test_with_asset_meta_struct(assets_df):
    out = M.with_asset_meta(assets_df)
    row = out.filter(F.col("doc_id") == 0).select("meta.*").first()
    assert row["mime"] == "image/fimg"
    assert row["width"] == 64 and row["height"] == 32
    audio = out.filter(F.col("doc_id") == 1).select("meta.*").first()
    assert audio["mime"] == "audio/faud"
    assert audio["sample_rate"] == 8100
    video = out.filter(F.col("doc_id") == 2).select("meta.*").first()
    assert video["mime"] == "video/fvid"
    assert video["n_frames"] == 7
    # all rows decode without error
    assert out.filter(F.col("meta.error").isNotNull()).count() == 0


def test_frame_sample_explode_counts(assets_df):
    frames = M.sample_video_frames(assets_df, every_n=2)
    got = {r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for doc_id in range(2, 30, 3):
        n_frames = 5 + doc_id % 20
        assert got[doc_id] == (n_frames + 1) // 2
    assert set(got) == set(range(2, 30, 3))
    # frame chunks are fixed size
    sizes = frames.select(F.length("frame").alias("l")).distinct().collect()
    assert {r["l"] for r in sizes} == {M.VIDEO_FRAME_BYTES}


def test_resize_image_dims_and_determinism(assets_df):
    resized = M.resize_image(assets_df.filter(F.col("doc_id") % 3 == 0), 16, 8)
    metas = M.with_asset_meta(resized, asset_col="resized").select("meta.*").collect()
    assert all(m["width"] == 16 and m["height"] == 8 for m in metas)
    # deterministic: same input -> same bytes
    a = resized.select("resized").collect()
    b = M.resize_image(assets_df.filter(F.col("doc_id") % 3 == 0), 16, 8).select("resized").collect()
    assert [r["resized"] for r in a] == [r["resized"] for r in b]


def test_image_byte_histogram_shape(assets_df):
    feats = M.image_byte_histogram(assets_df.filter(F.col("doc_id") % 3 == 0), bins=16)
    rows = feats.select("features").collect()
    assert all(len(r["features"]) == 16 for r in rows)
    # bins are individually rounded to 6 decimals -> sum can drift ~1e-5
    assert all(abs(sum(r["features"]) - 1.0) < 1e-4 for r in rows)


def test_synth_assets_with_meta_matches_composed_path(spark, assets_df):
    # The fused single-Python-stage operator must produce exactly what the
    # composable attach_fake_assets -> with_asset_meta pipeline produces.
    docs = spark.range(0, 30).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text-"), F.col("id")).alias("text")
    )
    fused = {
        r["doc_id"]: r["meta"]
        for r in M.synth_assets_with_meta(docs, keep=("doc_id",)).collect()
    }
    composed = {
        r["doc_id"]: r["meta"]
        for r in M.with_asset_meta(assets_df, keep=["doc_id"]).collect()
    }
    assert fused == composed and len(fused) == 30


def test_with_asset_meta_keep_prunes_output_columns(assets_df):
    out = M.with_asset_meta(assets_df, keep=["doc_id"])
    assert out.columns == ["doc_id", "meta"]


class TestImageDhash:
    def test_brightness_shift_and_cross_format_invariance(self):
        import numpy as np

        from duckdb_cloudflare_spark.operators.multimodal import image_dhash_bytes
        from duckdb_cloudflare_spark.util import bmp, png

        rng = np.random.RandomState(7)
        pix = (rng.rand(16, 20) * 200).astype(np.uint8)
        base = png.encode_png(pix.tobytes(), 20, 16, 1)
        shifted = png.encode_png(
            (pix.astype(int) + 40).clip(0, 255).astype(np.uint8).tobytes(), 20, 16, 1
        )
        # same pixels as 3-channel BMP (r=g=b): the channel mean reproduces
        # the grayscale, so the hash must agree across FORMATS too
        rgb = np.repeat(pix[:, :, None], 3, axis=2)
        as_bmp = bmp.encode_bmp(rgb.tobytes(), 20, 16)
        h = image_dhash_bytes(base)
        assert h is not None
        assert image_dhash_bytes(shifted) == h  # gradients survive +40
        assert image_dhash_bytes(as_bmp) == h  # format-independent
        other = png.encode_png(
            (rng.rand(16, 20) * 200).astype(np.uint8).tobytes(), 20, 16, 1
        )
        assert image_dhash_bytes(other) != h

    def test_decode_error_contract(self):
        from duckdb_cloudflare_spark.operators.multimodal import (
            encode_fake_audio,
            image_dhash_bytes,
        )

        assert image_dhash_bytes(None) is None
        assert image_dhash_bytes(b"garbage") is None
        assert image_dhash_bytes(b"\x89PNG\r\n\x1a\ntruncated") is None
        # non-image modality is not an image: NULL, not an exception
        assert image_dhash_bytes(encode_fake_audio(8000, 100, b"x" * 100)) is None

    def test_dedup_clusters_and_keep_rule(self, spark):
        import numpy as np

        from duckdb_cloudflare_spark.operators.multimodal import image_dhash_dedup
        from duckdb_cloudflare_spark.util import png

        rng = np.random.RandomState(11)
        pix_a = (rng.rand(8, 12) * 200).astype(np.uint8)
        pix_b = (rng.rand(8, 12) * 200).astype(np.uint8)
        blob_a = png.encode_png(pix_a.tobytes(), 12, 8, 1)
        bright_a = png.encode_png(
            (pix_a.astype(int) + 30).clip(0, 255).astype(np.uint8).tobytes(), 12, 8, 1
        )
        blob_b = png.encode_png(pix_b.tobytes(), 12, 8, 1)
        rows = [(5, blob_a), (2, bright_a), (9, blob_b), (1, None), (4, b"junk")]
        df = spark.createDataFrame(rows, "doc_id long, asset binary")
        out = {r["keep_id"]: r for r in image_dhash_dedup(df).collect()}
        # undecodables dropped; the {5, 2} near-dup cluster keeps the
        # LOWEST id as exemplar; one row per cluster (the p01 precedent)
        assert set(out) == {2, 9}
        assert out[2]["cluster_size"] == 2
        assert out[9]["cluster_size"] == 1


class TestAudioFeatures:
    def test_closed_form_fixtures(self):
        from duckdb_cloudflare_spark.operators.multimodal import (
            audio_features_bytes,
            encode_fake_audio,
        )

        # square wave at +/-100: rms == peak == 100, never silent/clipped
        sq = bytes([228 if (i // 10) % 2 else 28 for i in range(1000)])
        f = audio_features_bytes(encode_fake_audio(8000, 1000, sq))
        assert f["rms"] == 100.0 and f["peak"] == 100
        assert f["silence_frac"] == 0.0 and f["clipped_frac"] == 0.0
        assert f["duration_ms"] == 125.0
        # digital silence
        s = audio_features_bytes(encode_fake_audio(16000, 500, bytes([128] * 500)))
        assert s["rms"] == 0.0 and s["silence_frac"] == 1.0
        assert s["zero_cross_rate"] == 0.0
        # full-scale clipping
        c = audio_features_bytes(encode_fake_audio(8000, 100, bytes([255, 0] * 50)))
        assert c["clipped_frac"] == 1.0 and c["peak"] == 128
        # alternating-sign samples cross at every step
        alt = audio_features_bytes(
            encode_fake_audio(8000, 100, bytes([188, 68] * 50))
        )
        assert alt["zero_cross_rate"] == 1.0
        # error contract
        assert audio_features_bytes(None) is None
        assert audio_features_bytes(b"FIMGxxxx") is None
        # empty payload (header-only truncated upload): a silent row, not a drop
        e = audio_features_bytes(encode_fake_audio(8000, 100, b""))
        assert e["silence_frac"] == 1.0 and e["rms"] == 0.0

    def test_matches_numpy_reference_on_random_payloads(self):
        import numpy as np

        from duckdb_cloudflare_spark.operators.multimodal import (
            audio_features_bytes,
            encode_fake_audio,
        )

        rng = np.random.RandomState(109)
        for _ in range(50):
            payload = rng.randint(0, 256, size=rng.randint(2, 400)).astype(
                np.uint8
            ).tobytes()
            f = audio_features_bytes(encode_fake_audio(8000, len(payload), payload))
            s = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) - 128
            assert f["rms"] == float(np.sqrt((s.astype(np.float64) ** 2).mean()))
            assert f["peak"] == int(np.abs(s).max())
            assert f["silence_frac"] == float((np.abs(s) <= 8).mean())
            nz = s[s != 0]
            want_zc = (
                int((np.signbit(nz[1:]) != np.signbit(nz[:-1])).sum()) / (len(s) - 1)
                if len(nz) > 1
                else 0.0
            )
            assert f["zero_cross_rate"] == want_zc

    def test_mixed_column_drops_non_audio(self, spark):
        from duckdb_cloudflare_spark.operators.multimodal import (
            encode_fake_audio,
            encode_fake_image,
            with_audio_features,
        )

        rows = [
            (1, encode_fake_audio(8000, 4, bytes([128, 228, 28, 128]))),
            (2, encode_fake_image(4, 4, 1, bytes(16))),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, asset binary")
        out = with_audio_features(df).collect()
        assert [r["doc_id"] for r in out] == [1]
        assert out[0]["peak"] == 100


class TestVideoSceneStats:
    def test_planted_scene_cut_closed_form(self):
        from duckdb_cloudflare_spark.operators.multimodal import (
            VIDEO_FRAME_BYTES,
            VID_MAGIC,
            _VID_HDR,
            video_scene_stats_bytes,
        )

        still = bytes([10] * VIDEO_FRAME_BYTES)
        jump = bytes([200] * VIDEO_FRAME_BYTES)
        blob = _VID_HDR.pack(VID_MAGIC, 320, 240, 10, 4) + still * 3 + jump
        s = video_scene_stats_bytes(blob)
        assert s["n_frames"] == 4 and s["n_scene_changes"] == 1
        assert s["max_frame_delta"] == 190.0
        assert s["mean_frame_delta"] == 190.0 / 3
        assert s["scene_rate_per_s"] == 1 / 0.4  # 1 cut / (4 frames @ 10fps)

    def test_synthetic_container_is_constant_drift_no_scenes(self):
        from duckdb_cloudflare_spark.operators.multimodal import (
            encode_fake_video,
            video_scene_stats_bytes,
        )

        # encode_fake_video frames differ by exactly +7 per byte (mod 256,
        # no wrap below 256-7*n_frames): constant drift, zero scene cuts
        s = video_scene_stats_bytes(encode_fake_video(320, 240, 12, 8))
        assert s["n_frames"] == 8 and s["n_scene_changes"] == 0
        assert s["mean_frame_delta"] == 7.0 == s["max_frame_delta"]

    def test_truncated_and_degenerate_containers(self):
        from duckdb_cloudflare_spark.operators.multimodal import (
            VIDEO_FRAME_BYTES,
            VID_MAGIC,
            _VID_HDR,
            encode_fake_audio,
            video_scene_stats_bytes,
        )

        # header claims 10 frames, payload carries 1.5: profile the ONE
        # complete frame present (error-as-row, not a crash)
        blob = _VID_HDR.pack(VID_MAGIC, 320, 240, 10, 10) + bytes(
            VIDEO_FRAME_BYTES + VIDEO_FRAME_BYTES // 2
        )
        s = video_scene_stats_bytes(blob)
        assert s["n_frames"] == 1 and s["n_scene_changes"] == 0
        assert video_scene_stats_bytes(None) is None
        assert video_scene_stats_bytes(b"FVID") is None  # short header
        assert video_scene_stats_bytes(encode_fake_audio(8000, 4, b"abcd")) is None

    def test_mixed_column_drops_non_video(self, spark):
        from duckdb_cloudflare_spark.operators.multimodal import (
            encode_fake_image,
            encode_fake_video,
            with_video_scene_stats,
        )

        rows = [
            (1, encode_fake_video(320, 240, 10, 5)),
            (2, encode_fake_image(4, 4, 1, bytes(16))),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, asset binary")
        out = with_video_scene_stats(df).collect()
        assert [r["doc_id"] for r in out] == [1]
        assert out[0]["n_frames"] == 5
