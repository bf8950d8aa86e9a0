"""Staging-root lifecycle: bounded retention under a tag."""

from __future__ import annotations


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
