"""Concurrent stage execution with per-call timeouts and progress.

The reference fans tiles out to a ``multiprocessing.Pool``
(/root/reference/s2p/parallel.py); here host-side work (IO, sparse solves)
runs on a thread pool while device work serializes through the single JAX
stream per process, so workers default to a small thread count.  The public
contract matches the reference's ``launch_calls``: per-call timeout, child
exceptions re-raised on the driver, a ``done K / N tiles`` progress line,
and optional per-tile log redirection.
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import os
import sys
import threading
import traceback


class TimeoutError_(Exception):
    pass


class _StreamRouter(io.TextIOBase):
    """Thread-local stdout/stderr routing.

    ``contextlib.redirect_stdout`` swaps the process-global ``sys.stdout``,
    so concurrent tile workers would capture each other's (and the
    driver's) output.  This router is installed once and routes each
    thread's writes to its registered sink, falling back to the real
    stream (driver progress lines keep going to the terminal).
    """

    def __init__(self, fallback):
        self.fallback = fallback
        self._local = threading.local()

    def push(self, target):
        self._local.target = target

    def pop(self):
        self._local.target = None

    @property
    def _t(self):
        return getattr(self._local, 'target', None) or self.fallback

    def write(self, s):
        return self._t.write(s)

    def flush(self):
        try:
            return self._t.flush()
        except ValueError:
            pass

    def writable(self):
        return True


def _tile_log_path(item):
    if isinstance(item, tuple) and isinstance(item[0], dict):
        return os.path.join(item[0]['dir'], f'pair_{item[1]}', 'stdout.log')
    if isinstance(item, dict) and 'dir' in item:
        return os.path.join(item['dir'], 'stdout.log')
    return None


def launch_calls(fun, list_of_args, nb_workers=None, *extra_args,
                 tilewise=True, timeout=600, debug=False):
    """Run ``fun`` over work items concurrently.

    Args:
        fun: callable; called as fun(*item, *extra_args) when the item is a
            tuple, else fun(item, *extra_args).
        list_of_args: work items.
        nb_workers: thread count (None = min(8, n_items)).
        tilewise: when True, each call's stdout/stderr is appended to the
            tile's stdout.log (unless debug).
        timeout: seconds to wait for each call before raising.

    Returns:
        list of results in input order; raises the first child exception.
    """
    n = len(list_of_args)
    if n == 0:
        return []
    nb_workers = nb_workers or min(8, n)
    done_count = [0]

    router_out = _StreamRouter(sys.stdout)
    router_err = _StreamRouter(sys.stderr)

    def call(item):
        args = tuple(item) if isinstance(item, tuple) else (item,)
        args += tuple(extra_args)
        log = _tile_log_path(item) if tilewise else None
        if log and not debug:
            os.makedirs(os.path.dirname(log), exist_ok=True)
            buf = io.StringIO()
            router_out.push(buf)
            router_err.push(buf)
            try:
                out = fun(*args)
            except Exception:
                buf.write(f'Exception in {getattr(fun, "__name__", fun)}\n')
                buf.write(traceback.format_exc())
                raise
            finally:
                router_out.pop()
                router_err.pop()
                with open(log, 'a') as f:
                    f.write(buf.getvalue())
            return out
        return fun(*args)

    results = []
    saved = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = router_out, router_err
    try:
        with cf.ThreadPoolExecutor(nb_workers) as pool:
            futs = [pool.submit(call, item) for item in list_of_args]
            try:
                for fut in futs:
                    results.append(fut.result(timeout=timeout))
                    done_count[0] += 1
                    status = 'done {} / {} tiles'.format(done_count[0], n)
                    end = '\n' if done_count[0] == n else '\r'
                    router_out.fallback.write(status + end)
                    router_out.fallback.flush()
            except cf.TimeoutError:
                for f in futs:
                    f.cancel()
                raise TimeoutError_(
                    f'tile call did not complete within {timeout} s')
            except KeyboardInterrupt:
                for f in futs:
                    f.cancel()
                raise
    finally:
        sys.stdout, sys.stderr = saved
    return results


class SerialRunner:
    """Runner facade used by tiling (map interface, sequential)."""

    def map(self, fun, items):
        return [fun(i) for i in items]


class PoolRunner:
    """Runner facade over launch_calls."""

    def __init__(self, nb_workers=None, timeout=600):
        self.nb_workers = nb_workers
        self.timeout = timeout

    def map(self, fun, items):
        items = list(items)
        nb = self.nb_workers or min(8, max(1, len(items)))
        with cf.ThreadPoolExecutor(nb) as pool:
            futs = [pool.submit(fun, i) for i in items]
            return [f.result(timeout=self.timeout) for f in futs]
