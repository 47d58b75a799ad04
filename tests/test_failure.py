"""Failure-detection subsystem (parallel/failure.py)."""

import time

import pytest

from abc_tpu.parallel.failure import DeadlineExceeded, barrier, deadline


def test_deadline_passes_fast_block():
    with deadline(5.0):
        x = sum(range(1000))
    assert x == 499500


def test_deadline_raises_on_hang():
    with pytest.raises(DeadlineExceeded):
        with deadline(0.2):
            time.sleep(2.0)


def test_barrier_counts_devices():
    assert barrier(timeout=60.0) == 8   # conftest forces 8 virtual devices
