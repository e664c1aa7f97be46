"""Bucketing helper tests."""

from go_pocket_tts_tpu.utils import buckets as bk


def test_pick_bucket_basic():
    assert bk.pick_bucket(0, bk.PROMPT_BUCKETS) == 16
    assert bk.pick_bucket(1, bk.PROMPT_BUCKETS) == 16
    assert bk.pick_bucket(16, bk.PROMPT_BUCKETS) == 16
    assert bk.pick_bucket(17, bk.PROMPT_BUCKETS) == 32
    assert bk.pick_bucket(1024, bk.PROMPT_BUCKETS) == 1024


def test_pick_bucket_beyond_largest_rounds_up():
    assert bk.pick_bucket(1100, bk.PROMPT_BUCKETS) == 2048
    assert bk.pick_bucket(2049, bk.PROMPT_BUCKETS) == 3072


def test_round_up():
    assert bk.round_up(0, 64) == 0
    assert bk.round_up(1, 64) == 64
    assert bk.round_up(64, 64) == 64
    assert bk.round_up(65, 64) == 128
