"""Real multi-process execution of the pipeline (SURVEY.md section 7.7).

Spawns TWO OS processes that jointly run ``pipeline.main`` on the pair
scene through ``jax.distributed`` (localhost coordinator, CPU backend,
shared out_dir) and asserts:

  * the two per-process tile partitions are disjoint and cover the grid;
  * the final DSM is IDENTICAL (bitwise, NaN-aware) to a single-process
    run -- each tile's whole stage chain runs in exactly one process and
    the batched stage kernels are padding/bucket-composition independent
    (ops/mgm_flow.py), so distribution must not change a single bit.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from conftest import data_path

_WORKER = r"""
import json, sys
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, '/root/repo')
cfg = json.loads(sys.argv[1])
port, n, k = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
from s2p_tpu.parallel import distributed as dist
dist.init(f'localhost:{port}', n, k)
assert dist.process_count() == n and dist.process_index() == k
from s2p_tpu import pipeline
pipeline.main(cfg)
# record this worker's partition for the coverage assertion
with open(cfg['out_dir'] + '/tiles.txt') as f:
    tiles = [line.strip() for line in f if line.strip()]
mine = dist.partition_tiles(tiles)
with open(cfg['out_dir'] + f'/worker_tiles_{k}.json', 'w') as f:
    json.dump(mine, f)
"""


def _pair_cfg(out_dir):
    return {
        'out_dir': str(out_dir),
        'images': [
            {'img': data_path('input_pair/img_01.tif')},
            {'img': data_path('input_pair/img_02.tif')},
        ],
        'roi': {'x': 150, 'y': 150, 'w': 600, 'h': 600},
        'horizontal_margin': 20,
        'vertical_margin': 5,
        'tile_size': 300,
        'disp_range_method': 'sift',
        'msk_erosion': 0,
        'dsm_resolution': 0.5,
        '3d_filtering_r': 5,
        '3d_filtering_n': 50,
    }


@pytest.mark.e2e
def test_two_process_run_matches_single_process(tmp_path):
    from s2p_tpu import pipeline
    from s2p_tpu.geo import geotiff

    # single-process reference run
    out_single = tmp_path / 'single'
    pipeline.main(_pair_cfg(out_single))
    dsm_single = geotiff.read_with_nans(str(out_single / 'dsm.tif'))

    # two-process run over a shared out_dir; clean_intermediate exercises
    # the post-barrier deletion ordering (a pre-barrier sweep would race
    # the other process's neighbor-halo reads and change its DSM)
    out_multi = tmp_path / 'multi'
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    cfg_multi = _pair_cfg(out_multi)
    cfg_multi['clean_intermediate'] = True
    cfg_json = json.dumps(cfg_multi)
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)   # no virtual-device split in the workers
    procs = [subprocess.Popen(
        [sys.executable, '-c', _WORKER, cfg_json, str(port), '2', str(k)],
        env=env, cwd='/root/repo',
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for k in (0, 1)]
    outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    for k, p in enumerate(procs):
        assert p.returncode == 0, f'worker {k} failed:\n{outs[k][-4000:]}'

    # disjoint partitions covering the tile grid
    parts = [json.load(open(out_multi / f'worker_tiles_{k}.json'))
             for k in (0, 1)]
    with open(out_multi / 'tiles.txt') as f:
        all_tiles = [line.strip() for line in f if line.strip()]
    assert len(all_tiles) >= 4                       # 2x2 grid
    assert parts[0] and parts[1]                     # both did real work
    assert not set(parts[0]) & set(parts[1])
    assert sorted(parts[0] + parts[1]) == sorted(all_tiles)

    # the distributed DSM is bit-identical to the single-process one
    dsm_multi = geotiff.read_with_nans(str(out_multi / 'dsm.tif'))
    assert dsm_multi.shape == dsm_single.shape
    same = (dsm_multi == dsm_single) | (np.isnan(dsm_multi)
                                        & np.isnan(dsm_single))
    assert same.all(), f'{(~same).sum()} DSM cells differ across runs'
