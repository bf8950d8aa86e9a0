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


def test_gate_report_empty_expectations(spark):
    """gate_report on an empty rule list must return an empty decision
    table with the standard schema, mirroring enforce()'s no-op
    (ADVICE r3: df.agg() with zero exprs raised)."""
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.expectations import gate_report

    df = spark.range(0, 3).select(F.col("id").alias("v"))
    out = gate_report(df, [])
    assert out.columns == ["rule", "action", "violations", "gate_blocks"]
    assert out.count() == 0


def test_staging_dir_retains_previous_root():
    """Bounded retention: requesting a new root under a tag keeps the
    PREVIOUS root alive (a lazy reader over it must stay valid) and
    deletes only older generations (ADVICE r3)."""
    import os

    from olist_lakehouse_2_0_spark import staging

    r1 = staging.staging_dir("test_retention")
    r2 = staging.staging_dir("test_retention")
    assert os.path.isdir(r1) and os.path.isdir(r2)
    r3 = staging.staging_dir("test_retention")
    assert not os.path.exists(r1), "oldest root should be rotated out"
    assert os.path.isdir(r2) and os.path.isdir(r3)
