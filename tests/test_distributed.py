"""Multi-host scaffolding: tile partitioning, barriers, single-process
degradation (s2p_tpu.parallel.distributed)."""

import numpy as np

from s2p_tpu.parallel import distributed as dist


def test_partition_blocks_cover_and_are_disjoint():
    items = list(range(23))
    for count in (1, 2, 3, 8):
        blocks = [dist.partition_tiles(items, index=i, count=count)
                  for i in range(count)]
        flat = [x for b in blocks for x in b]
        assert flat == items                       # coverage, order, disjoint
        sizes = [len(b) for b in blocks]
        assert max(sizes) - min(sizes) <= 1        # balanced
        # blocks are contiguous (host-local IO windows stay compact)
        for b in blocks:
            if b:
                assert b == list(range(b[0], b[-1] + 1))


def test_single_process_degradation():
    assert dist.process_count() == 1
    assert dist.process_index() == 0
    assert dist.is_primary()
    dist.barrier('noop')                           # must be a no-op
    items = ['a', 'b']
    assert dist.partition_tiles(items) == items


def test_init_without_configuration_is_noop(monkeypatch):
    monkeypatch.delenv('S2P_TPU_COORDINATOR', raising=False)
    count, index = dist.init()
    assert (count, index) == (1, 0)
