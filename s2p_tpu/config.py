"""Immutable, validated pipeline configuration.

The reference keeps one mutable module-global dict of ~50 entries
(/root/reference/s2p/config.py) that is shallow-updated from user JSON and
shared across forked workers -- a design its own tests have to work around
(end2end_test.py:62 deletes keys between runs).  Here the configuration is a
frozen dataclass created once per run; the JSON key names are identical to
the reference's so existing s2p config files work unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
import warnings
from typing import Any, Optional

# JSON keys that are not valid python identifiers
_ALIASES = {'3d_filtering_r': 'filtering_3d_r', '3d_filtering_n': 'filtering_3d_n'}
_ALIASES_INV = {v: k for k, v in _ALIASES.items()}


@dataclasses.dataclass
class ImageSpec:
    """One input image: path, camera model, and optional masks."""
    img: str
    rpc: Any = None          # path / dict, as given by the user
    rpcm: Any = None         # loaded RPCModel (filled by build_cfg)
    clr: Optional[str] = None
    cld: Optional[str] = None
    roi: Optional[str] = None
    wat: Optional[str] = None

    def to_dict(self):
        d = {'img': self.img}
        for f in ('rpc', 'clr', 'cld', 'roi', 'wat'):
            v = getattr(self, f)
            if v is not None:
                d[f] = v
        return d


@dataclasses.dataclass(frozen=True)
class Config:
    """All pipeline parameters; defaults mirror reference config.py:12-179."""

    # inputs / outputs
    out_dir: str = 's2p_output'
    temporary_dir: str = 's2p_tmp'
    clean_tmp: bool = True
    clean_intermediate: bool = False
    full_img: bool = False
    images: tuple = ()
    roi: Optional[dict] = None
    roi_geojson: Any = None

    # tiling
    tile_size: int = 800
    horizontal_margin: int = 50
    vertical_margin: int = 10

    # execution
    max_processes: Optional[int] = None
    max_processes_stereo_matching: Optional[int] = None
    omp_num_threads: int = 1
    timeout: int = 600
    debug: bool = False

    # DSM
    dsm_resolution: float = 4.0
    dsm_radius: float = 0.0
    dsm_sigma: Optional[float] = None

    # SIFT / pointing
    relative_sift_match_thresh: bool = True
    sift_match_thresh: float = 0.6
    sift_device: str = 'auto'     # 'auto' | 'device' | 'host' SIFT placement
    n_gcp_per_axis: int = 5
    epipolar_thresh: float = 0.5
    max_pointing_error: float = 10.0

    # disparity range policy
    disp_range_extra_margin: float = 0.2
    max_disp_range: Optional[int] = None
    disp_range_method: str = 'wider_sift_exogenous'
    disp_range_exogenous_low_margin: float = -10.0
    disp_range_exogenous_high_margin: float = 100.0
    disp_min: Optional[float] = None
    disp_max: Optional[float] = None
    alt_min: Optional[float] = None
    alt_max: Optional[float] = None

    # rectification
    rectification_method: str = 'rpc'
    register_with_shear: bool = True

    # masks
    border_margin: int = 10
    msk_erosion: int = 2

    # fusion (triplet mode)
    fusion_operator: str = 'average_if_close'
    fusion_thresh: float = 3.0

    # DEMs
    rpc_alt_range_scale_factor: float = 1.0
    use_srtm: bool = False
    exogenous_dem: Optional[str] = None
    exogenous_dem_geoid_mode: bool = True

    # stereo matching
    matching_algorithm: str = 'mgm'
    census_ncc_win: int = 5
    stereo_speckle_filter: int = 25
    stereo_regularity_multiplier: float = 1.0
    mgm_nb_directions: int = 8
    mgm_timeout: int = 600
    mgm_leftright_threshold: float = 1.0
    mgm_leftright_control: int = 1
    mgm_mindiff_control: int = -1

    # postprocessing
    filtering_3d_r: Optional[float] = None
    filtering_3d_n: Optional[int] = None
    cargarse_basura: bool = True

    # output CRS
    out_crs: Optional[str] = None
    out_geoid: bool = False

    # computed at build time
    gsd: Optional[float] = None
    neighborhood_dirs: Optional[list] = None

    # ------------------------------------------------------------------ #
    @classmethod
    def field_names(cls):
        return {f.name for f in dataclasses.fields(cls)}

    @classmethod
    def from_user_dict(cls, d: dict) -> 'Config':
        """Build a Config from a user dict (same JSON schema as s2p)."""
        known = cls.field_names()
        kwargs = {}
        for k, v in d.items():
            key = _ALIASES.get(k, k)
            if key == 'images':
                v = tuple(img if isinstance(img, ImageSpec) else ImageSpec(**img)
                          for img in v)
            if key in known:
                kwargs[key] = v
            else:
                warnings.warn(f'ignoring unknown parameter {k}.')
        return cls(**kwargs)

    def replace(self, **kw) -> 'Config':
        return dataclasses.replace(self, **kw)

    def to_dict(self, drop_rpcm=True):
        d = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name == 'images':
                v = [img.to_dict() for img in v]
            if v is None and f.name in ('gsd', 'neighborhood_dirs', 'roi_geojson'):
                continue
            key = _ALIASES_INV.get(f.name, f.name)
            d[key] = v
        return d

    def dump_json(self, path):
        with open(path, 'w') as f:
            json.dump(self.to_dict(), f, indent=2, default=_json_default)


def _json_default(o):
    import numpy as np
    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(f'not JSON serializable: {o!r}')


def read_config_file(config_file: str) -> dict:
    """Read a json config, resolving relative paths against the file location.

    Returns a plain user dict (same contract as the reference
    read_config_file, /root/reference/s2p/__init__.py:650-681) so that it can
    be edited before being handed to :func:`s2p_tpu.pipeline.main`.
    """
    with open(config_file, 'r') as f:
        user_cfg = json.load(f)

    def absolutize(p):
        if not os.path.isabs(p):
            return os.path.join(os.path.abspath(os.path.dirname(config_file)), p)
        return p

    if 'out_dir' in user_cfg:
        user_cfg['out_dir'] = absolutize(user_cfg['out_dir'])
    for k in ('roi_geojson', 'exogenous_dem'):
        if isinstance(user_cfg.get(k), str):
            user_cfg[k] = absolutize(user_cfg[k])
    for img in user_cfg.get('images', []):
        for d in ('img', 'rpc', 'clr', 'cld', 'roi', 'wat'):
            if isinstance(img.get(d), str):
                img[d] = absolutize(img[d])
    return user_cfg
