"""Multimodal plumbing: schemas, batching, determinism (codec stubbed)."""

import pytest


class TestMultimodal:
    def test_image_features(self, spark):
        from seq2rel_ds_spark.operators.multimodal import image_features, synthesize_media

        media = synthesize_media(spark, 20, kind="image")
        feats = image_features(media).collect()
        assert len(feats) == 20
        by_id = {r["media_id"]: r for r in feats}
        r = by_id["image-3"]
        assert 16 <= r["width"] < 64 and r["channels"] == 3
        assert 0.0 <= r["mean_luma"] <= 1.0 and len(r["phash"]) == 16
        # determinism under different partitioning
        again = {
            r["media_id"]: r["phash"]
            for r in image_features(synthesize_media(spark, 20).repartition(7)).collect()
        }
        assert {k: v["phash"] for k, v in by_id.items()} == again

    def test_audio_features(self, spark):
        from seq2rel_ds_spark.operators.multimodal import audio_features, synthesize_media

        media = synthesize_media(spark, 10, kind="audio")
        feats = audio_features(media).collect()
        assert len(feats) == 10
        assert all(r["sample_rate"] >= 8000 and r["rms"] > 0 for r in feats)

    def test_frame_sampling_fanout(self, spark):
        from seq2rel_ds_spark.operators.multimodal import sample_frames, synthesize_media

        media = synthesize_media(spark, 5, kind="video")
        frames = sample_frames(media, every_nth=2, max_frames=4).collect()
        assert len(frames) == 20
        assert sorted({r["frame_idx"] for r in frames}) == [0, 2, 4, 6]

    def test_real_codec_path_raises(self, spark):
        from seq2rel_ds_spark.operators.multimodal import image_features, synthesize_media

        media = synthesize_media(spark, 2, kind="image")
        with pytest.raises(Exception) as exc_info:
            image_features(media, deterministic_fake=False).collect()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )
