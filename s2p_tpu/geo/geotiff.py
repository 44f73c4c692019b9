"""Self-contained GeoTIFF reader / writer.

The runtime image has no rasterio/GDAL, so this module implements the subset
of GeoTIFF needed by the pipeline (the reference reaches the same features
through rasterio, cf. /root/reference/s2p/common.py:104-156):

  * read: strip- and tile-organized TIFFs, uint8/16/32, int16/32, float32/64,
    compression none / deflate / packbits / LZW, horizontal-difference
    predictor, windowed reads, nodata, RPC tag, geo transform + CRS,
  * write: strip-organized (or 256x256-tiled) TIFFs with optional deflate
    compression, geo tags (ModelPixelScale/Tiepoint + GeoKeys), nodata, RPC.

Pixel decoding goes through PIL when possible (C-speed), with a pure-numpy
fallback for layouts PIL does not handle (multi-band unusual dtypes).
"""

from __future__ import annotations

import dataclasses
import struct
import zlib

import numpy as np

# TIFF tag ids
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BPS, _T_COMPRESSION, _T_PHOTO = 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR = 284, 317
_T_TILE_W, _T_TILE_H, _T_TILE_OFFSETS, _T_TILE_COUNTS = 322, 323, 324, 325
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE, _T_TIEPOINT = 33550, 33922
_T_GEO_KEYS, _T_GEO_DOUBLES, _T_GEO_ASCII = 34735, 34736, 34737
_T_GDAL_METADATA, _T_GDAL_NODATA = 42112, 42113
_T_RPC = 50844

_TYPE_FMT = {1: 'B', 2: 'c', 3: 'H', 4: 'I', 5: 'II', 6: 'b', 7: 'B',
             8: 'h', 9: 'i', 10: 'ii', 11: 'f', 12: 'd', 16: 'Q', 17: 'q'}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8}


@dataclasses.dataclass
class Profile:
    """Raster metadata, the moral equivalent of a rasterio profile."""
    width: int
    height: int
    count: int = 1
    dtype: str = 'float32'
    crs: object = None           # s2p_tpu.geo.crs.CRS or None
    transform: tuple = None      # (a, b, c, d, e, f): x = c + a*col + b*row
    nodata: float = None
    rpc_tag: tuple = None

    @property
    def shape(self):
        return (self.height, self.width)

    def copy(self, **kw):
        return dataclasses.replace(self, **kw)


class _Tiff:
    """Minimal TIFF container parser (first IFD only)."""

    def __init__(self, path):
        self.path = path
        with open(path, 'rb') as f:
            self.data = f.read()
        d = self.data
        if d[:2] == b'II':
            self.en = '<'
        elif d[:2] == b'MM':
            self.en = '>'
        else:
            raise ValueError(f'{path} is not a TIFF file')
        magic, = struct.unpack(self.en + 'H', d[2:4])
        self.big = magic == 43
        if self.big:
            off, = struct.unpack(self.en + 'Q', d[8:16])
        else:
            off, = struct.unpack(self.en + 'I', d[4:8])
        self.tags = self._parse_ifd(off)

    def _parse_ifd(self, off):
        d, en = self.data, self.en
        tags = {}
        if self.big:
            n, = struct.unpack(en + 'Q', d[off:off + 8])
            off += 8
            esz, cnt_fmt = 20, 'Q'
        else:
            n, = struct.unpack(en + 'H', d[off:off + 2])
            off += 2
            esz, cnt_fmt = 12, 'I'
        for i in range(n):
            e = d[off + i * esz: off + (i + 1) * esz]
            tag, typ = struct.unpack(en + 'HH', e[:4])
            cnt, = struct.unpack(en + cnt_fmt, e[4:4 + struct.calcsize(cnt_fmt)])
            if typ not in _TYPE_FMT:
                continue
            size = _TYPE_SIZE[typ] * cnt
            inline = 8 if self.big else 4
            payload_at = e[12:20] if self.big else e[8:12]
            if size <= inline:
                raw = payload_at[:size]
            else:
                p, = struct.unpack(en + ('Q' if self.big else 'I'), payload_at)
                raw = d[p:p + size]
            tags[tag] = self._decode(typ, cnt, raw)
        return tags

    def _decode(self, typ, cnt, raw):
        en = self.en
        if typ == 2:  # ASCII
            return raw.split(b'\0')[0].decode('latin1')
        fmt = _TYPE_FMT[typ]
        if typ in (5, 10):  # rationals
            vals = struct.unpack(en + fmt * cnt, raw)
            return tuple(vals[i] / max(vals[i + 1], 1) for i in range(0, len(vals), 2))
        vals = struct.unpack(en + fmt * cnt, raw)
        return vals[0] if cnt == 1 else vals

    # ------------------------------------------------------------------ #
    def dtype(self):
        bps = self.tags.get(_T_BPS, 1)
        if isinstance(bps, tuple):
            bps = bps[0]
        sf = self.tags.get(_T_SAMPLE_FORMAT, 1)
        if isinstance(sf, tuple):
            sf = sf[0]
        kind = {1: 'u', 2: 'i', 3: 'f'}.get(sf, 'u')
        return np.dtype(f'{self.en}{kind}{bps // 8}')

    def decompress(self, raw, out_size):
        comp = self.tags.get(_T_COMPRESSION, 1)
        if comp == 1:
            return raw
        if comp in (8, 32946):
            return zlib.decompress(raw)
        if comp == 32773:
            return _packbits_decode(raw, out_size)
        if comp == 5:
            return _lzw_decode(raw, out_size)
        raise NotImplementedError(f'TIFF compression {comp} not supported')

    def read_array(self):
        t = self.tags
        w, h = t[_T_WIDTH], t[_T_HEIGHT]
        spp = t.get(_T_SPP, 1)
        dt = self.dtype()
        planar = t.get(_T_PLANAR, 1)
        pred = t.get(_T_PREDICTOR, 1)

        if _T_TILE_OFFSETS in t:
            tw, th = t[_T_TILE_W], t[_T_TILE_H]
            offs = _as_tuple(t[_T_TILE_OFFSETS])
            cnts = _as_tuple(t[_T_TILE_COUNTS])
            ntx = (w + tw - 1) // tw
            nty = (h + th - 1) // th
            nplanes = spp if planar == 2 else 1
            cpp = 1 if planar == 2 else spp
            out = np.zeros((h, w, spp), dtype=dt.newbyteorder('='))
            k = 0
            for plane in range(nplanes):
                for ty in range(nty):
                    for tx in range(ntx):
                        raw = self.data[offs[k]: offs[k] + cnts[k]]
                        buf = self.decompress(raw, th * tw * cpp * dt.itemsize)
                        a = np.frombuffer(buf, dtype=dt).reshape(th, tw, cpp)
                        a = _unpredict(a, pred)
                        y0, x0 = ty * th, tx * tw
                        hh = min(th, h - y0)
                        ww = min(tw, w - x0)
                        if planar == 2:
                            out[y0:y0 + hh, x0:x0 + ww, plane] = a[:hh, :ww, 0]
                        else:
                            out[y0:y0 + hh, x0:x0 + ww, :] = a[:hh, :ww, :]
                        k += 1
        else:
            rps = t.get(_T_ROWS_PER_STRIP, h)
            offs = _as_tuple(t[_T_STRIP_OFFSETS])
            cnts = _as_tuple(t[_T_STRIP_COUNTS])
            nstrips_per_plane = (h + rps - 1) // rps
            nplanes = spp if planar == 2 else 1
            cpp = 1 if planar == 2 else spp
            out = np.zeros((h, w, spp), dtype=dt.newbyteorder('='))
            k = 0
            for plane in range(nplanes):
                for s in range(nstrips_per_plane):
                    y0 = s * rps
                    hh = min(rps, h - y0)
                    raw = self.data[offs[k]: offs[k] + cnts[k]]
                    buf = self.decompress(raw, hh * w * cpp * dt.itemsize)
                    a = np.frombuffer(buf, dtype=dt, count=hh * w * cpp)
                    a = a.reshape(hh, w, cpp)
                    a = _unpredict(a, pred)
                    if planar == 2:
                        out[y0:y0 + hh, :, plane] = a[:, :, 0]
                    else:
                        out[y0:y0 + hh, :, :] = a
                    k += 1
        return out


def _as_tuple(v):
    return v if isinstance(v, tuple) else (v,)


def _unpredict(a, pred):
    if pred == 2:
        return np.cumsum(a, axis=1, dtype=a.dtype)
    if pred == 3:
        # floating-point predictor: bytes split across the row then hor-diffed
        h, w, c = a.shape
        raw = a.view(np.uint8).reshape(h, w * c * a.itemsize)
        raw = np.cumsum(raw, axis=1, dtype=np.uint8)
        raw = raw.reshape(h, a.itemsize, w * c)
        raw = raw.transpose(0, 2, 1)[:, :, ::-1].copy()  # big-endian order
        return raw.view(f'>f{a.itemsize}').astype(a.dtype).reshape(h, w, c)
    return a


def _packbits_decode(raw, out_size):
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n and len(out) < out_size:
        b = raw[i]
        i += 1
        if b < 128:
            out += raw[i:i + b + 1]
            i += b + 1
        elif b > 128:
            out += raw[i:i + 1] * (257 - b)
            i += 1
    return bytes(out)


def _lzw_decode(raw, out_size):
    """TIFF-flavour LZW (MSB-first codes, early change)."""
    out = bytearray()
    dict_limit = 4094
    table = None
    prev = None
    bitpos = 0
    nbits = 9
    data = raw
    total_bits = len(data) * 8

    def read_code():
        nonlocal bitpos
        if bitpos + nbits > total_bits:
            return 257  # EOI
        byte0 = bitpos >> 3
        val = int.from_bytes(data[byte0:byte0 + 4].ljust(4, b'\0'), 'big')
        val = (val >> (32 - nbits - (bitpos & 7))) & ((1 << nbits) - 1)
        bitpos += nbits
        return val

    while len(out) < out_size:
        code = read_code()
        if code == 256:  # clear
            table = [bytes([i]) for i in range(256)] + [b'', b'']
            nbits = 9
            prev = None
            continue
        if code == 257:  # end of information
            break
        if table is None:
            raise ValueError('LZW stream does not start with a clear code')
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) >= (1 << nbits) - 1 and nbits < 12:
            nbits += 1
    return bytes(out)


# ===================================================================== #
# Public read API
# ===================================================================== #

def read_tag(path, tag):
    """Return the raw value of a TIFF tag, or None."""
    return _Tiff(path).tags.get(tag)


def read_profile(path) -> Profile:
    t = _Tiff(path)
    tags = t.tags
    spp = tags.get(_T_SPP, 1)
    transform = None
    if _T_PIXEL_SCALE in tags and _T_TIEPOINT in tags:
        sx, sy = tags[_T_PIXEL_SCALE][0], tags[_T_PIXEL_SCALE][1]
        tp = tags[_T_TIEPOINT]
        # tiepoint: raster (i, j, k) -> model (X, Y, Z)
        i, j, X, Y = tp[0], tp[1], tp[3], tp[4]
        transform = (sx, 0.0, X - i * sx, 0.0, -sy, Y + j * sy)
    crs = _crs_from_geokeys(tags)
    nodata = None
    if _T_GDAL_NODATA in tags:
        try:
            nodata = float(tags[_T_GDAL_NODATA])
        except ValueError:
            pass
    return Profile(width=tags[_T_WIDTH], height=tags[_T_HEIGHT], count=spp,
                   dtype=str(np.dtype(t.dtype().newbyteorder('='))),
                   crs=crs, transform=transform, nodata=nodata,
                   rpc_tag=tags.get(_T_RPC))


def _crs_from_geokeys(tags):
    from . import crs as crsmod
    gk = tags.get(_T_GEO_KEYS)
    if not gk:
        return None
    gk = _as_tuple(gk)
    epsg = None
    model = None
    for i in range(4, len(gk), 4):
        key, loc, cnt, val = gk[i:i + 4]
        if key == 1024:
            model = val
        elif key == 3072 and loc == 0:   # ProjectedCSType
            epsg = val
        elif key == 2048 and loc == 0 and epsg is None:  # GeographicType
            epsg = val
    if epsg and epsg not in (32767,):
        try:
            return crsmod.CRS.from_epsg(epsg)
        except Exception:
            return None
    return None


def read(path, window=None, boundless=False, fill_value=0):
    """Read a TIFF as an array of shape (h, w) or (h, w, bands).

    Args:
        window: optional (x, y, w, h) pixel window.
        boundless: if True, the window may extend beyond the raster and the
            outside area is filled with ``fill_value``.

    Windowed reads go through the native chunk-level decoder
    (s2p_tpu/native/tiffio.cpp) when available, touching only the
    strips/tiles that intersect the window.
    """
    if window is not None:
        arr = _read_native(path, window, boundless, fill_value)
        if arr is not None:
            return arr
    arr = _Tiff(path).read_array()  # (H, W, spp)
    if arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if window is None:
        return arr
    x, y, w, h = [int(v) for v in window]
    H, W = arr.shape[:2]
    if not boundless:
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, W), min(y + h, H)
        return arr[y0:y1, x0:x1]
    out_shape = (h, w) + arr.shape[2:]
    out = np.full(out_shape, fill_value, dtype=arr.dtype)
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, W), min(y + h, H)
    if x0 < x1 and y0 < y1:
        out[y0 - y:y1 - y, x0 - x:x1 - x] = arr[y0:y1, x0:x1]
    return out


def _read_native(path, window, boundless, fill_value):
    """Windowed read via the native library; None when unsupported or when
    the fill semantics cannot be expressed (native zero-fills)."""
    try:
        from . import geotiff_native
    except ImportError:
        return None
    if not geotiff_native.available():
        return None
    x, y, w, h = [int(v) for v in window]
    prof_wh = None
    if not boundless:
        # clip to the raster like the python path does
        t = _Tiff(path).tags
        W, H = t[_T_WIDTH], t[_T_HEIGHT]
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, W), min(y + h, H)
        if x1 <= x0 or y1 <= y0:
            return None
        out = geotiff_native.read_window(path, x0, y0, x1 - x0, y1 - y0)
        return out
    if fill_value not in (0, 0.0):
        return None
    return geotiff_native.read_window(path, x, y, w, h)


def read_with_nans(path):
    """Read replacing the nodata value with NaN (cf. common.py:104-121)."""
    prof = read_profile(path)
    arr = read(path)
    if prof.nodata is not None and not np.isnan(prof.nodata):
        arr = arr.astype(np.float32) if arr.dtype.kind != 'f' else arr
        arr[arr == prof.nodata] = np.nan
    return arr


# ===================================================================== #
# Write API
# ===================================================================== #

def _pack_tag(en, tag, typ, values, heap, heap_base):
    if typ == 2:
        raw = values.encode('latin1') + b'\0'
        cnt = len(raw)
    else:
        if not isinstance(values, (tuple, list, np.ndarray)):
            values = (values,)
        cnt = len(values)
        raw = struct.pack(en + _TYPE_FMT[typ] * cnt, *values)
    if len(raw) <= 4:
        val = raw.ljust(4, b'\0')
    else:
        val = struct.pack(en + 'I', heap_base + len(heap))
        heap += raw
        if len(heap) % 2:
            heap += b'\0'
    return struct.pack(en + 'HHI', tag, typ, cnt) + val


def write(path, array, profile: Profile = None, crs=None, transform=None,
          nodata=None, rpc=None, compress=None, tiled=False, tags=None):
    """Write a (Geo)TIFF.

    Args:
        array: (h, w) or (h, w, bands) numpy array.
        profile: optional Profile carrying crs/transform/nodata defaults.
        compress: None or 'deflate'.
        tiled: write 256x256 tiles instead of strips.
    """
    array = np.asarray(array)
    if array.ndim == 2:
        array = array[:, :, None]
    h, w, spp = array.shape
    if profile is not None:
        crs = crs if crs is not None else profile.crs
        transform = transform if transform is not None else profile.transform
        nodata = nodata if nodata is not None else profile.nodata

    dt = array.dtype
    sf = {'u': 1, 'i': 2, 'f': 3}[dt.kind]
    en = '<'
    arr = np.ascontiguousarray(array, dtype=dt.newbyteorder('='))

    # build chunks
    chunks = []
    if tiled:
        tw = th = 256
        ntx, nty = (w + tw - 1) // tw, (h + th - 1) // th
        for ty in range(nty):
            for tx in range(ntx):
                block = np.zeros((th, tw, spp), dtype=arr.dtype)
                y0, x0 = ty * th, tx * tw
                hh, ww = min(th, h - y0), min(tw, w - x0)
                block[:hh, :ww] = arr[y0:y0 + hh, x0:x0 + ww]
                chunks.append(block.tobytes())
    else:
        rps = max(1, min(h, (1 << 16) // max(1, w * spp * dt.itemsize) + 1))
        for y0 in range(0, h, rps):
            chunks.append(arr[y0:y0 + rps].tobytes())

    if compress == 'deflate':
        chunks = [zlib.compress(c, 6) for c in chunks]
        comp_tag = 8
    else:
        comp_tag = 1

    # assemble tag list
    entries = []  # (tag, typ, values)
    entries.append((_T_WIDTH, 3, w))
    entries.append((_T_HEIGHT, 3, h))
    entries.append((_T_BPS, 3, tuple([dt.itemsize * 8] * spp)))
    entries.append((_T_COMPRESSION, 3, comp_tag))
    entries.append((_T_PHOTO, 3, 2 if spp >= 3 else 1))
    entries.append((_T_SPP, 3, spp))
    entries.append((_T_PLANAR, 3, 1))
    entries.append((_T_SAMPLE_FORMAT, 3, tuple([sf] * spp)))
    if spp > 3:
        entries.append((338, 3, tuple([0] * (spp - 3))))  # ExtraSamples

    if transform is not None:
        a, b, c, d, e, f = transform
        entries.append((_T_PIXEL_SCALE, 12, (a, -e, 0.0)))
        entries.append((_T_TIEPOINT, 12, (0.0, 0.0, 0.0, c, f, 0.0)))
    if crs is not None:
        gk, gascii = _geokeys_for_crs(crs)
        entries.append((_T_GEO_KEYS, 3, gk))
        if gascii:
            entries.append((_T_GEO_ASCII, 2, gascii))
    if nodata is not None:
        entries.append((_T_GDAL_NODATA, 2, 'nan' if (isinstance(nodata, float)
                        and np.isnan(nodata)) else repr(float(nodata))))
    if rpc is not None:
        from .rpc_io import rpc_to_tag_values
        vals = rpc if isinstance(rpc, (tuple, list, np.ndarray)) else rpc_to_tag_values(rpc)
        entries.append((_T_RPC, 12, tuple(float(v) for v in vals)))
    if tags:
        xml = '<GDALMetadata>\n' + ''.join(
            f'  <Item name="{k}">{v}</Item>\n' for k, v in tags.items()) + '</GDALMetadata>\n'
        entries.append((_T_GDAL_METADATA, 2, xml))

    # chunk location tags (filled after layout)
    header_size = 8
    # layout: header | IFD | heap | data chunks
    # we need IFD size first: entries + tile/strip offset+count tags
    if tiled:
        entries.append((_T_TILE_W, 3, 256))
        entries.append((_T_TILE_H, 3, 256))
        off_tag, cnt_tag = _T_TILE_OFFSETS, _T_TILE_COUNTS
    else:
        entries.append((_T_ROWS_PER_STRIP, 3, rps))
        off_tag, cnt_tag = _T_STRIP_OFFSETS, _T_STRIP_COUNTS
    entries.append((off_tag, 4, tuple([0] * len(chunks))))
    entries.append((cnt_tag, 4, tuple(len(c) for c in chunks)))
    entries.sort(key=lambda t: t[0])

    n = len(entries)
    ifd_size = 2 + n * 12 + 4
    heap_base = header_size + ifd_size

    # two passes: first to size the heap, then with real chunk offsets
    for _pass in range(2):
        heap = bytearray()
        packed = []
        data_base = None
        if _pass == 1:
            data_base = heap_base + heap_len
            offs = []
            pos = data_base
            for c in chunks:
                offs.append(pos)
                pos += len(c) + (len(c) % 2)
            entries = [(t, ty, tuple(offs) if t == off_tag else v3)
                       for (t, ty, v3) in entries]
        for tag, typ, values in entries:
            packed.append(_pack_tag(en, tag, typ, values, heap, heap_base))
        heap_len = len(heap)

    out = bytearray()
    out += b'II*\0' + struct.pack(en + 'I', header_size)
    out += struct.pack(en + 'H', n)
    for p in packed:
        out += p
    out += struct.pack(en + 'I', 0)  # next IFD
    out += heap
    for c in chunks:
        out += c
        if len(c) % 2:
            out += b'\0'
    with open(path, 'wb') as f:
        f.write(bytes(out))


def _geokeys_for_crs(crs):
    """GeoKeyDirectory entries for a CRS (projected EPSG or geographic)."""
    from . import crs as crsmod
    if isinstance(crs, str) or isinstance(crs, int):
        crs = crsmod.CRS(crs)
    name = crs.name
    keys = [(1025, 0, 1, 1)]  # RasterPixelIsArea
    if crs.is_projected:
        keys.insert(0, (1024, 0, 1, 1))
        keys.append((1026, _T_GEO_ASCII, len(name) + 1, 0))
        keys.append((2049, _T_GEO_ASCII, 7, len(name) + 1))
        keys.append((3072, 0, 1, crs.epsg))
        keys.append((3076, 0, 1, 9001))  # meters
        gascii = name + '|WGS 84|'
    else:
        keys.insert(0, (1024, 0, 1, 2))
        keys.append((2048, 0, 1, crs.epsg or 4326))
        gascii = ''
    keys.sort(key=lambda k: k[0])
    header = (1, 1, 0, len(keys))
    flat = list(header)
    for k in keys:
        flat.extend(k)
    return tuple(flat), gascii


# ===================================================================== #
# PNG helpers (masks)
# ===================================================================== #

def read_png(path):
    from PIL import Image
    return np.array(Image.open(path))


def write_png(path, array):
    from PIL import Image
    arr = np.asarray(array)
    if arr.dtype == bool:
        arr = arr.astype(np.uint8) * 255
    Image.fromarray(arr).save(path)
