"""Failure-mode tests of the stage runner
(mirrors /root/reference/tests/parallel_test.py, common_test.py,
block_matching_test.py error paths)."""

import threading
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


def test_tile_logs_isolated_per_thread(tmp_path):
    """Each tile's prints land only in its own stdout.log; driver progress
    lines don't leak into tile logs (thread-local stream routing)."""
    tiles = []
    for k in range(6):
        d = tmp_path / f'tile_{k}'
        d.mkdir()
        tiles.append({'dir': str(d)})

    def work(tile):
        print(f"hello from {tile['dir']}")
        time.sleep(0.01)
        return tile['dir']

    out = runner.launch_calls(work, tiles, 3, timeout=30)
    assert out == [t['dir'] for t in tiles]
    for t in tiles:
        log = (tmp_path / t['dir'] / 'stdout.log').read_text()
        assert log == f"hello from {t['dir']}\n"


def test_worker_exception_logged_in_tile_log(tmp_path):
    d = tmp_path / 'tile_x'
    d.mkdir()

    def boom(tile):
        raise RuntimeError('tile exploded')

    with pytest.raises(RuntimeError, match='tile exploded'):
        runner.launch_calls(boom, [{'dir': str(d)}], 1, timeout=30)
    assert 'tile exploded' in (d / 'stdout.log').read_text()


def test_timeout_is_per_call_not_cumulative():
    """A slow early tile must not eat later tiles' budgets: each call's
    deadline runs from ITS OWN start (reference kills hung children per
    call, parallel.py:100-102; here per-execution deadlines)."""
    def work(x):
        time.sleep(0.3)
        return x

    t0 = time.monotonic()
    # 6 sequential-ish calls on 2 workers, each well under the 1s per-call
    # budget, ~0.9s total > any single budget if it were cumulative
    out = runner.launch_calls(work, list(range(6)), 2, tilewise=False,
                              timeout=1.0)
    assert out == list(range(6))
    assert time.monotonic() - t0 < 5


def test_hung_tile_raises_quickly_and_cancels_siblings():
    """Analogue of the reference kill test (common_test.py:23-37): a hung
    tile raises TimeoutError_ promptly, sets the cancellation event that
    cooperative checkpoints observe, and its daemon worker thread cannot
    block interpreter exit."""
    started = []

    def hang(x):
        started.append(x)
        for _ in range(200):
            time.sleep(0.05)
            if runner.cancelled():
                return 'cancelled'
        return 'finished'

    t0 = time.monotonic()
    with pytest.raises(runner.TimeoutError_):
        runner.launch_calls(hang, [1, 2], 2, tilewise=False, timeout=0.4)
    assert time.monotonic() - t0 < 3
    # the launch's cancel event is popped after the raise; workers saw it
    assert not runner.cancelled()


def test_checkpoint_raises_when_cancelled():
    class _Ev:
        def is_set(self):
            return True

    runner._cancel_stack.append(_Ev())
    try:
        with pytest.raises(runner.TimeoutError_):
            runner.checkpoint()
    finally:
        runner._cancel_stack.pop()


def test_warmup_first_excludes_compile_time():
    """warmup_first runs the first item with NO deadline (jit compiles of
    the first call must not eat the execution budget) and arms the
    per-call deadline for the rest."""
    slow_once = {'done': False}

    def fn(i):
        if not slow_once['done']:
            slow_once['done'] = True
            time.sleep(1.2)    # "compile" far beyond the deadline
        return i * 2

    r = runner.launch_calls(fn, list(range(5)), 2, timeout=0.8,
                            tilewise=False, warmup_first=True)
    assert r == [0, 2, 4, 6, 8]


def test_timeout_leaves_interpreter_usable():
    """A deadline abort raises TimeoutError_ on the driver and the runner
    keeps working afterwards (no wedged global state)."""
    def hang(i):
        if i == 0:
            # cooperative worker: polls the cancellation flag like the
            # device stage functions do between dispatches
            for _ in range(400):
                if runner.cancelled():
                    return i
                time.sleep(0.05)
        return i

    t0 = time.monotonic()
    with pytest.raises(runner.TimeoutError_):
        runner.launch_calls(hang, [0, 1], 2, timeout=0.3, tilewise=False)
    # the grace join reaped the cooperative worker promptly
    assert time.monotonic() - t0 < 4.0
    assert runner.launch_calls(lambda i: i + 1, [1, 2], 2, tilewise=False,
                               timeout=5) == [2, 3]
