"""Failure-mode tests of the stage runner
(mirrors /root/reference/tests/parallel_test.py, common_test.py,
block_matching_test.py error paths)."""

import time

import numpy as np
import pytest

from s2p_tpu import runner


def test_exceptions_propagate():
    def boom(x):
        raise ValueError(f'bad tile {x}')

    with pytest.raises(ValueError, match='bad tile'):
        runner.launch_calls(boom, [1, 2, 3], 2, tilewise=False, timeout=10)


def test_timeout_raises():
    def slow(x):
        time.sleep(5)
        return x

    with pytest.raises(runner.TimeoutError_):
        runner.launch_calls(slow, [1, 2], 2, tilewise=False, timeout=1)


def test_results_in_order():
    def work(x):
        time.sleep(0.01 * (5 - x))
        return x * 10

    out = runner.launch_calls(work, [1, 2, 3, 4], 4, tilewise=False, timeout=10)
    assert out == [10, 20, 30, 40]


def test_extra_args_and_tuple_items():
    def f(a, b, c):
        return a + b + c

    out = runner.launch_calls(f, [(1, 2), (3, 4)], 2, 10, tilewise=False,
                              timeout=10)
    assert out == [13, 17]
