"""End-to-end golden DSM tests (reference end2end_test.py:21-115).

Runs the full pipeline.main on the reference test scenes and compares the
final DSM against the committed reference goldens with the reference's
tolerances (pair: |mean| <= 0.025 m, p99 <= 1 m; triplet: 0.05 m / 2 m;
valid-pixel count rtol 1% atol 100), plus the zero-tolerance
tilewise-vs-monolithic seamlessness check and the mosaic-tool check.

These are the slowest tests in the suite (a full 3x3-tile scene per run on
the CPU mesh); they run last by filename convention and can be deselected
with `-m "not e2e"`.
"""

import glob
import os

import numpy as np
import pytest

from s2p_tpu import pipeline
from s2p_tpu.geo import geotiff
from s2p_tpu.ops import rasterize
from s2p_tpu.utils import mosaic

from conftest import data_path


def compare_dsm(computed, expected, absmean_tol, percentile_tol):
    """Reference end2end_test.py:21-55 comparison contract."""
    np.testing.assert_equal(computed.shape, expected.shape, verbose=True)
    n_computed = np.count_nonzero(np.isfinite(computed))
    n_expected = np.count_nonzero(np.isfinite(expected))
    np.testing.assert_allclose(n_computed, n_expected, rtol=.01, atol=100,
                               verbose=True)
    diff = computed - expected
    diff = diff[np.isfinite(diff)]
    meandiff = np.mean(diff)
    print('mean-difference:', meandiff, '(abs. tolerance=%s)' % absmean_tol)
    assert np.abs(meandiff) <= absmean_tol
    percentile = np.nanpercentile(np.abs(diff), 99)
    print('99th percentile abs difference', percentile,
          '(tolerance=%s)' % percentile_tol)
    assert percentile <= percentile_tol


def _run(config_file, out_dir):
    cfg = pipeline.read_config_file(config_file)
    cfg['out_dir'] = str(out_dir)
    pipeline.main(cfg)
    return cfg


@pytest.fixture(scope='session')
def pair_run(tmp_path_factory):
    out = tmp_path_factory.mktemp('e2e_pair')
    return _run(data_path('input_pair/config.json'), out), out


@pytest.fixture(scope='session')
def triplet_run(tmp_path_factory):
    out = tmp_path_factory.mktemp('e2e_triplet')
    return _run(data_path('input_triplet/config.json'), out), out


@pytest.mark.e2e
def test_end2end_pair(pair_run):
    _, out = pair_run
    computed = geotiff.read_with_nans(os.path.join(out, 'dsm.tif'))
    expected = geotiff.read_with_nans(data_path('expected_output/pair/dsm.tif'))
    compare_dsm(computed, expected, 0.025, 1)


@pytest.mark.e2e
def test_end2end_triplet(triplet_run):
    _, out = triplet_run
    computed = geotiff.read_with_nans(os.path.join(out, 'dsm.tif'))
    expected = geotiff.read_with_nans(data_path('expected_output/triplet/dsm.tif'))
    compare_dsm(computed, expected, 0.05, 2)


@pytest.mark.e2e
def test_mosaic(triplet_run, tmp_path):
    """Mosaic tool reproduces the triplet height map (end2end_test.py:85-97)."""
    _, out = triplet_run
    outfile = os.path.join(tmp_path, 'height_map.tif')
    mosaic.main(os.path.join(out, 'tiles.txt'), outfile,
                'pair_1/height_map.tif')
    computed = geotiff.read_with_nans(outfile)
    expected = geotiff.read_with_nans(
        data_path('expected_output/triplet/height_map.tif'))
    compare_dsm(computed, expected, absmean_tol=0.05, percentile_tol=2)


@pytest.mark.e2e
def test_distributed_plyflatten(triplet_run):
    """Tilewise DSM == monolithic rasterization, tolerance 0
    (end2end_test.py:100-115)."""
    cfg, out = triplet_run
    computed = geotiff.read_with_nans(os.path.join(out, 'dsm.tif'))
    clouds_list = glob.glob(os.path.join(out, 'tiles', '*', '*', 'cloud.ply'))
    assert clouds_list
    raster, _ = rasterize.plyflatten_from_plyfiles_list(
        clouds_list, resolution=cfg['dsm_resolution'], roi=None)
    expected = raster[:, :, 0]
    compare_dsm(computed, expected, 0, 0)


@pytest.mark.e2e
def test_resume_start_from(pair_run):
    """The --start_from resume contract (reference cli.py:18-20,
    __init__.py:566-623): re-running stages 5..7 on a completed out_dir
    reproduces the identical DSM from the stage-4 files on disk."""
    cfg, out = pair_run
    before = geotiff.read_with_nans(os.path.join(out, 'dsm.tif'))
    pipeline.main(dict(cfg), start_from=5)
    after = geotiff.read_with_nans(os.path.join(out, 'dsm.tif'))
    assert np.array_equal(before, after, equal_nan=True)


@pytest.mark.e2e
def test_resume_after_clean_intermediate_errors(pair_run, tmp_path):
    """Resuming a stage whose inputs were swept by clean_intermediate
    fails with a clear error instead of recomputing on garbage."""
    import shutil
    cfg, out = pair_run
    out2 = tmp_path / 'cleaned'
    shutil.copytree(out, out2)
    # simulate the post-stage-5 clean_intermediate state
    for p in glob.glob(str(out2 / 'tiles' / '*' / '*' / 'pair_1'
                           / 'rectified_disp.tif')):
        os.remove(p)
    cfg2 = dict(cfg)
    cfg2['out_dir'] = str(out2)
    with pytest.raises(RuntimeError, match='clean_intermediate'):
        pipeline.main(cfg2, start_from=5)


@pytest.mark.e2e
def test_resume_fresh_dir_errors(pair_run, tmp_path):
    """--start_from on an out_dir with no tiles.txt raises (parity with
    the reference's resume contract on a fresh directory)."""
    cfg, _ = pair_run
    cfg2 = dict(cfg)
    cfg2['out_dir'] = str(tmp_path / 'fresh')
    with pytest.raises(AssertionError, match='tiles.txt'):
        pipeline.main(cfg2, start_from=5)


@pytest.fixture(scope='session')
def pair_run_mgm_multi(tmp_path_factory):
    out = tmp_path_factory.mktemp('e2e_pair_multi')
    cfg = pipeline.read_config_file(data_path('input_pair/config.json'))
    cfg['out_dir'] = str(out)
    cfg['matching_algorithm'] = 'mgm_multi'
    pipeline.main(cfg)
    return cfg, out


@pytest.mark.e2e
def test_end2end_pair_mgm_multi(pair_run_mgm_multi):
    """Scene-level gate for the mgm_multi cascade (s2p's production
    matcher for real scenes, reference block_matching.py:268-310).

    Primary gate: the committed mgm_multi golden
    (tests/golden/pair_mgm_multi_dsm.tif, produced by THIS pipeline on
    CPU, bitwise-reproducible across rounds 4 and 5) at reference
    pair-class tolerances -- this pins the cascade's own behavior.
    Sanity bound: the reference's mgm golden at triplet-class tolerances
    + a 5% valid-count band (the cascade keeps ~2% fewer pixels than
    plain mgm; measured mean -0.029 m, p99 1.71 m vs that golden).
    """
    _, out = pair_run_mgm_multi
    computed = geotiff.read_with_nans(os.path.join(out, 'dsm.tif'))

    own_golden = geotiff.read_with_nans(
        os.path.join(os.path.dirname(__file__), 'golden',
                     'pair_mgm_multi_dsm.tif'))
    compare_dsm(computed, own_golden, 0.025, 1)

    expected = geotiff.read_with_nans(
        data_path('expected_output/pair/dsm.tif'))
    np.testing.assert_equal(computed.shape, expected.shape)
    n_computed = np.count_nonzero(np.isfinite(computed))
    n_expected = np.count_nonzero(np.isfinite(expected))
    np.testing.assert_allclose(n_computed, n_expected, rtol=.05)
    diff = computed - expected
    diff = diff[np.isfinite(diff)]
    assert np.abs(np.mean(diff)) <= 0.05
    assert np.nanpercentile(np.abs(diff), 99) <= 2.0
