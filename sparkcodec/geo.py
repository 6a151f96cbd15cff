"""GeoJSON -> ISO WKB encoding and geospatial statistics
(reference: src/wkb.js:13-144, src/geospatial.js:8-147).

WKB layout per geometry: byte order (1 = little-endian), uint32 type code
(base code + 1000 * dim flag: 0 = XY, 1 = XYZ, 3 = XYZM), then
type-specific payload (positions as float64s; rings/parts prefixed with
uint32 counts; Multi*/GeometryCollection nest full WKB children).

Statistics mirror the parquet GeospatialStatistics struct: a bounding box
per dimension (NaN/non-finite values skipped per dimension, not per
position) and the sorted set of geometry type codes seen.
"""

from __future__ import annotations

import math
import struct

_TYPE_CODES = {
    "Point": 1, "LineString": 2, "Polygon": 3,
    "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_TYPE_NAMES = {v: k for k, v in _TYPE_CODES.items()}
_DIM_FLAGS = {2: 0, 3: 1, 4: 3}
# ISO WKB dim flags (type code / 1000): 0=XY (2 doubles), 1=XYZ (3),
# 2=XYM (3 doubles -- M replaces Z, not in addition to it), 3=XYZM (4).
# The encoder never emits flag 2 (it can't distinguish Z from M in bare
# coordinate arrays); the decoder must still parse externally produced XYM.
_FLAG_DIMS = {0: 2, 1: 3, 2: 3, 3: 4}


def _infer_dim(geometry: dict) -> int:
    """Max position length in the geometry (reference infers the same way)."""
    if geometry["type"] == "GeometryCollection":
        return max((_infer_dim(g) for g in geometry.get("geometries", [])),
                   default=2)

    def walk(c) -> int:
        if not isinstance(c, (list, tuple)) or not c:
            return 0
        if isinstance(c[0], (int, float)):
            return len(c)
        return max((walk(x) for x in c), default=0)

    return max(walk(geometry.get("coordinates", [])), 2)


def _write_pos(out: bytearray, pos, dim: int) -> None:
    if len(pos) < dim:
        raise ValueError("geometry position dimensions mismatch")
    for i in range(dim):
        out.extend(struct.pack("<d", float(pos[i])))


def _write_line(out: bytearray, coords, dim: int) -> None:
    out.extend(struct.pack("<I", len(coords)))
    for p in coords:
        _write_pos(out, p, dim)


def _write_geometry(out: bytearray, geometry: dict) -> None:
    gtype = geometry.get("type")
    if gtype not in _TYPE_CODES:
        raise ValueError(f"unsupported geometry type {gtype!r}")
    dim = _infer_dim(geometry)
    if dim > 4:
        raise ValueError(f"unsupported geometry dimensions: {dim}")
    out.append(1)  # little endian
    out.extend(struct.pack("<I", _TYPE_CODES[gtype] + _DIM_FLAGS[dim] * 1000))
    c = geometry.get("coordinates")
    if gtype == "Point":
        _write_pos(out, c, dim)
    elif gtype == "LineString":
        _write_line(out, c, dim)
    elif gtype == "Polygon":
        out.extend(struct.pack("<I", len(c)))
        for ring in c:
            _write_line(out, ring, dim)
    elif gtype in ("MultiPoint", "MultiLineString", "MultiPolygon",
                   "GeometryCollection"):
        # ISO WKB: nested children carry their own headers, and their dim
        # flags must MATCH the parent's -- a 2D child inside an XYZ Multi*
        # would make external readers misparse the stream, so mixed
        # dimensions raise instead of emitting malformed bytes
        inner_type = {"MultiPoint": "Point", "MultiLineString": "LineString",
                      "MultiPolygon": "Polygon"}.get(gtype)
        children = (geometry.get("geometries", [])
                    if gtype == "GeometryCollection"
                    else [{"type": inner_type, "coordinates": part}
                          for part in c])
        out.extend(struct.pack("<I", len(children)))
        for child in children:
            child_dim = _infer_dim(child)
            if child_dim != dim:
                raise ValueError(
                    f"dimension mismatch inside {gtype}: child has "
                    f"{child_dim} dims, parent inferred {dim}")
            _write_geometry(out, child)


def geojson_to_wkb(geometry: dict) -> bytes:
    out = bytearray()
    _write_geometry(out, geometry)
    return bytes(out)


# ---------- WKB decode (test oracle; the reference relies on hyparquet's) ----------

def _read_pos(buf, pos: int, dim: int, little: bool):
    fmt = ("<" if little else ">") + "d" * dim
    vals = list(struct.unpack_from(fmt, buf, pos))
    return vals, pos + 8 * dim


def _read_u32(buf, pos: int, little: bool):
    return struct.unpack_from("<I" if little else ">I", buf, pos)[0], pos + 4


def _read_geometry(buf, pos: int):
    little = buf[pos] == 1
    pos += 1
    code, pos = _read_u32(buf, pos, little)
    base, flag = code % 1000, code // 1000
    dim = _FLAG_DIMS[flag]
    gtype = _TYPE_NAMES[base]
    if gtype == "Point":
        c, pos = _read_pos(buf, pos, dim, little)
        return {"type": gtype, "coordinates": c}, pos
    if gtype == "LineString":
        n, pos = _read_u32(buf, pos, little)
        coords = []
        for _ in range(n):
            p, pos = _read_pos(buf, pos, dim, little)
            coords.append(p)
        return {"type": gtype, "coordinates": coords}, pos
    if gtype == "Polygon":
        n, pos = _read_u32(buf, pos, little)
        rings = []
        for _ in range(n):
            m, pos = _read_u32(buf, pos, little)
            ring = []
            for _ in range(m):
                p, pos = _read_pos(buf, pos, dim, little)
                ring.append(p)
            rings.append(ring)
        return {"type": gtype, "coordinates": rings}, pos
    # Multi*/collection: nested full WKB children
    n, pos = _read_u32(buf, pos, little)
    children = []
    for _ in range(n):
        child, pos = _read_geometry(buf, pos)
        children.append(child)
    if gtype == "GeometryCollection":
        return {"type": gtype, "geometries": children}, pos
    inner = {"MultiPoint": "coordinates", "MultiLineString": "coordinates",
             "MultiPolygon": "coordinates"}[gtype]
    return {"type": gtype, inner: [c["coordinates"] for c in children]}, pos


def wkb_to_geojson(buf: bytes) -> dict:
    geo, _ = _read_geometry(bytes(buf), 0)
    return geo


# ---------- geospatial statistics ----------

def _extend_bounds(bounds: dict, coords) -> None:
    """Recurse nested coordinate lists; each dimension filtered
    independently (a NaN x does not skip the y)."""
    if not isinstance(coords, (list, tuple)) or not coords:
        return
    if isinstance(coords[0], (int, float)):
        names = ["x", "y", "z", "m"]
        for i, v in enumerate(coords[:4]):
            if not (isinstance(v, (int, float)) and math.isfinite(v)):
                continue
            k = names[i]
            lo, hi = bounds.get(k, (math.inf, -math.inf))
            bounds[k] = (min(lo, v), max(hi, v))
        return
    for c in coords:
        _extend_bounds(bounds, c)


def geospatial_statistics(values) -> dict | None:
    """Bounding box + sorted geometry type codes for a geometry column
    (reference: src/geospatial.js:8-38)."""
    type_codes: set[int] = set()
    bounds: dict = {}

    def one(g) -> None:
        if g is None:
            return
        if g["type"] == "GeometryCollection":
            type_codes.add(_TYPE_CODES["GeometryCollection"]
                           + _DIM_FLAGS[_infer_dim(g)] * 1000)
            for child in g.get("geometries", []):
                one(child)
            return
        type_codes.add(_TYPE_CODES[g["type"]] + _DIM_FLAGS[_infer_dim(g)] * 1000)
        _extend_bounds(bounds, g.get("coordinates"))

    for v in values:
        one(v)
    bbox = None
    if all(k in bounds for k in ("x", "y")):
        bbox = {"xmin": bounds["x"][0], "xmax": bounds["x"][1],
                "ymin": bounds["y"][0], "ymax": bounds["y"][1]}
        for k in ("z", "m"):
            if k in bounds:
                bbox[f"{k}min"], bbox[f"{k}max"] = bounds[k]
    if not type_codes and bbox is None:
        return None
    return {"bbox": bbox, "geospatial_types": sorted(type_codes)}


# ---------- Spark column operator ----------

def geojson_to_wkb_column(df, geo_col: str, id_col: str):
    """GeoJSON string column -> (id, wkb binary, geometry type code);
    Arrow-batched kernel (geometries are irregular trees, like variant)."""
    import json

    import pandas as pd

    def enc(it):
        for pdf in it:
            wkbs, codes = [], []
            for s in pdf[geo_col]:
                g = None if s is None else json.loads(s)
                if g is None:
                    wkbs.append(None)
                    codes.append(None)
                else:
                    wkbs.append(geojson_to_wkb(g))
                    codes.append(_TYPE_CODES[g["type"]] + _DIM_FLAGS[_infer_dim(g)] * 1000)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "wkb": wkbs, "geo_type": codes})

    return df.select(id_col, geo_col).mapInPandas(
        enc, f"{id_col} long, wkb binary, geo_type int")


def wkb_points_to_xy_column(df, id_col: str, wkb_col: str = "wkb"):
    """(id, wkb) Point column -> (id, x, y); the decode side of the WKB
    roundtrip (oracle-checkable: coordinates are float64-exact)."""
    import pandas as pd

    def dec(it):
        for pdf in it:
            xs, ys = [], []
            for b in pdf[wkb_col]:
                if b is None:  # null geometries propagate as null x/y
                    xs.append(None)
                    ys.append(None)
                    continue
                g = wkb_to_geojson(bytes(b))
                xs.append(g["coordinates"][0])
                ys.append(g["coordinates"][1])
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "x": xs, "y": ys})

    return df.select(id_col, wkb_col).mapInPandas(
        dec, f"{id_col} long, x double, y double")
