"""WKB encoder + geospatial stats (reference: src/wkb.js, src/geospatial.js):
golden bytes from the public WKB spec, roundtrips, bbox semantics."""

from __future__ import annotations

import math
import struct

import pytest

from sparkcodec.geo import (
    geojson_to_wkb,
    geojson_to_wkb_column,
    geospatial_statistics,
    wkb_to_geojson,
)


def test_point_golden_bytes():
    # POINT(1 2), little-endian ISO WKB: 01 01000000 + two float64s
    wkb = geojson_to_wkb({"type": "Point", "coordinates": [1.0, 2.0]})
    assert wkb == b"\x01\x01\x00\x00\x00" + struct.pack("<dd", 1.0, 2.0)


def test_point_z_code_offset():
    wkb = geojson_to_wkb({"type": "Point", "coordinates": [1.0, 2.0, 3.0]})
    assert struct.unpack_from("<I", wkb, 1)[0] == 1001  # Z flag = +1000
    assert len(wkb) == 5 + 24


def test_all_geometry_types_roundtrip():
    geoms = [
        {"type": "Point", "coordinates": [1.5, -2.5]},
        {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0]]},
        {"type": "Polygon", "coordinates": [
            [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
            [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]},
        {"type": "MultiPoint", "coordinates": [[0, 0], [1, 2]]},
        {"type": "MultiLineString", "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]},
        {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [1, 0], [1, 1], [0, 0]]],
            [[[5, 5], [6, 5], [6, 6], [5, 5]]]]},
        {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [9, 9]},
            {"type": "LineString", "coordinates": [[0, 0], [9, 9]]}]},
    ]
    for g in geoms:
        back = wkb_to_geojson(geojson_to_wkb(g))

        def canon(x):
            if isinstance(x, dict):
                return {k: canon(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [canon(i) for i in x]
            return float(x) if isinstance(x, (int, float)) else x

        assert canon(back) == canon(g)


def test_dimension_mismatch_raises():
    with pytest.raises(ValueError, match="dimensions mismatch"):
        geojson_to_wkb({"type": "LineString", "coordinates": [[1, 2, 3], [1, 2]]})


def test_geospatial_statistics_bbox_and_types():
    stats = geospatial_statistics([
        {"type": "Point", "coordinates": [1.0, 10.0]},
        {"type": "LineString", "coordinates": [[-5.0, 2.0], [3.0, 7.0]]},
        None,
        {"type": "Point", "coordinates": [0.0, 0.0, 42.0]},
    ])
    assert stats["bbox"]["xmin"] == -5.0 and stats["bbox"]["xmax"] == 3.0
    assert stats["bbox"]["ymin"] == 0.0 and stats["bbox"]["ymax"] == 10.0
    assert stats["bbox"]["zmin"] == 42.0 == stats["bbox"]["zmax"]
    assert stats["geospatial_types"] == [1, 2, 1001]  # Point, LineString, PointZ


def test_geospatial_statistics_nan_per_dimension():
    # NaN x must not suppress the finite y of the same position
    stats = geospatial_statistics([
        {"type": "Point", "coordinates": [math.nan, 5.0]},
        {"type": "Point", "coordinates": [2.0, math.nan]},
    ])
    assert stats["bbox"] == {"xmin": 2.0, "xmax": 2.0, "ymin": 5.0, "ymax": 5.0}
    # y-only data -> no bbox at all, types still reported
    stats2 = geospatial_statistics([{"type": "Point", "coordinates": [math.nan, 1.0]}])
    assert stats2["bbox"] is None and stats2["geospatial_types"] == [1]
    assert geospatial_statistics([None, None]) is None


def test_geojson_to_wkb_column(spark):
    import json

    rows = [(i, json.dumps({"type": "Point", "coordinates": [float(i), float(-i)]}))
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, geo string")
    out = {r["id"]: (bytes(r["wkb"]), r["geo_type"])
           for r in geojson_to_wkb_column(df, "geo", "id").collect()}
    for i in range(50):
        wkb, code = out[i]
        assert code == 1
        assert wkb_to_geojson(wkb)["coordinates"] == [float(i), float(-i)]


def test_decode_external_xym_point():
    """ISO WKB XYM (type code +2000) carries 3 doubles per position; the
    decoder must parse externally produced XYM geometries even though our
    encoder never emits dim-flag 2."""
    import struct

    # little-endian, type 2001 (Point XYM), x=1.5 y=2.5 m=9.0
    buf = struct.pack("<BI3d", 1, 2001, 1.5, 2.5, 9.0)
    geo = wkb_to_geojson(buf)
    assert geo["type"] == "Point"
    assert geo["coordinates"] == [1.5, 2.5, 9.0]


def test_decode_external_xym_linestring():
    import struct

    pts = [(0.0, 0.0, 1.0), (3.0, 4.0, 2.0)]
    buf = struct.pack("<BII", 1, 2002, len(pts))
    for p in pts:
        buf += struct.pack("<3d", *p)
    geo = wkb_to_geojson(buf)
    assert geo["type"] == "LineString"
    assert geo["coordinates"] == [[0.0, 0.0, 1.0], [3.0, 4.0, 2.0]]


def test_mixed_dimension_multi_raises():
    """A 2D child inside an XYZ Multi* would emit ISO-WKB that external
    readers misparse; mixed dims raise instead (code-review r3)."""
    with pytest.raises(ValueError, match="dimension mismatch"):
        geojson_to_wkb({"type": "MultiPoint",
                        "coordinates": [[1.0, 2.0], [1.0, 2.0, 3.0]]})


def test_wkb_xy_column_propagates_nulls(spark):
    from sparkcodec.geo import wkb_points_to_xy_column

    df = spark.createDataFrame(
        [(1, geojson_to_wkb({"type": "Point", "coordinates": [1.5, 2.5]})),
         (2, None)],
        "id long, wkb binary")
    rows = {r["id"]: (r["x"], r["y"])
            for r in wkb_points_to_xy_column(df, "id").collect()}
    assert rows[1] == (1.5, 2.5)
    assert rows[2] == (None, None)
