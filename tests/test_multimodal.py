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


def test_dhash_identical_and_perturbed_images(spark):
    """dHash invariants: identical pixels give identical hashes
    (hamming 0); a small brightness SHIFT leaves the hash unchanged
    (dHash keys on gradients, not absolute values); flipping the
    gradient direction of one column changes only a few bits."""
    import numpy as np

    from olist_lakehouse_2_0_spark.operators.multimodal import (
        dhash_images,
        encode_bmp,
    )

    base = np.add.outer(np.arange(16), np.arange(16)) % 256
    img = np.repeat(base[:, :, None], 3, axis=2).astype(np.uint8)
    brighter = ((base + 40) % 256)
    img_b = np.repeat(brighter[:, :, None], 3, axis=2).astype(np.uint8)
    flipped = base.copy()
    flipped[:, 8] = 255  # one hot column flips neighbouring gradients
    img_f = np.repeat(flipped[:, :, None], 3, axis=2).astype(np.uint8)

    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(img))),
         (2, bytearray(encode_bmp(img))),
         (3, bytearray(encode_bmp(img_b))),
         (4, bytearray(encode_bmp(img_f)))],
        "id int, image binary",
    )
    h = {r.id: (r.dhash_hi, r.dhash_lo) for r in dhash_images(df, "id").collect()}
    assert h[1] == h[2]

    def hamming(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    # brightness shift: gradients preserved except at the mod-256 wrap
    assert hamming(h[1], h[3]) <= 8
    flip_ham = hamming(h[1], h[4])
    assert 0 < flip_ham <= 16
