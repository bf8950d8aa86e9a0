"""Multimodal codec edge cases (BMP/WAV are the real decode paths)."""

from __future__ import annotations

import pandas as pd


def test_decode_audio_stats_stereo_frames(spark):
    """Stereo PCM16: n_samples/duration must count FRAMES, not
    interleaved values (ADVICE r3 — duration was 2x for stereo)."""
    from olist_lakehouse_2_0_spark.operators.multimodal import (
        decode_audio_stats,
        encode_wav,
    )

    # 100 stereo frames at 1000 Hz -> 100 ms; amplitudes L=1, R=3.
    interleaved = [1, 3] * 100
    payload = encode_wav(interleaved, sample_rate=1000, channels=2)
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [7], "audio": [bytearray(payload)]})
    )
    row = decode_audio_stats(df, "clip_id").collect()[0]
    assert row.n_samples == 100
    assert row.duration_ms == 100
    assert row.amp_sum == 100 * (1 + 3)
