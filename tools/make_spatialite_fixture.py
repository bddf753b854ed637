#!/usr/bin/env python3
"""Builds a SpatiaLite fixture (src/test/resources/sample.sqlite) AND
an independent golden for q_src_spatialite.

The database is plain SQLite (python's sqlite3) with the legacy
SpatiaLite `geometry_columns` registry and geometry stored as Gaia
BLOB-Geometry values packed here from the published layout: 0x00
START, endian byte, int32 SRID, double[4] MBR, 0x7C marker, int32
geometry class, WKB-like body (collection entities prefixed 0x69 +
class int), 0xFE END. Shares no code with the Scala reader — the
golden CSV (layer, rowid, name, gtype, npts, bbox) is this builder's
own accounting, same contract as make_gdb_fixture.py.

One layer is deliberately packed BIG-endian to pin the endian byte
semantics (every number in the blob follows it).
"""
import csv
import os
import sqlite3
import struct

OUT = "src/test/resources/sample.sqlite"
GOLDEN = "src/test/resources/golden/spatialite_golden.csv"


def gaia(cls, body, coords, endian="<"):
    xs = [c[0] for c in coords]
    ys = [c[1] for c in coords]
    mbr = struct.pack(endian + "4d", min(xs), min(ys), max(xs), max(ys))
    endian_byte = 1 if endian == "<" else 0
    return (b"\x00" + bytes([endian_byte]) + struct.pack(endian + "i", 4326)
            + mbr + b"\x7c" + struct.pack(endian + "i", cls) + body + b"\xfe")


def pt_body(x, y, endian="<"):
    return struct.pack(endian + "2d", x, y)


def line_body(pts, endian="<"):
    return struct.pack(endian + "i", len(pts)) + b"".join(
        struct.pack(endian + "2d", x, y) for x, y in pts)


def poly_body(rings, endian="<"):
    out = struct.pack(endian + "i", len(rings))
    for r in rings:
        out += struct.pack(endian + "i", len(r)) + b"".join(
            struct.pack(endian + "2d", x, y) for x, y in r)
    return out


def mpoly_body(polys, endian="<"):
    out = struct.pack(endian + "i", len(polys))
    for rings in polys:
        out += b"\x69" + struct.pack(endian + "i", 3) + poly_body(rings, endian)
    return out


PLACES = [
    (1, "alpha", 100, 1.5, (2.5, 3.25)),
    (2, "béta üml", 200, -2.75, (-10.125, 20.0625)),
    (3, None, None, 3.125, (100.0, -45.5)),
    (4, "delta", 400, 4.5, None),  # NULL geometry
]

ROUTES = [  # this layer is packed BIG-endian
    (1, "main", [(0.0, 0.0), (10.5, 0.25), (20.0, -5.125)]),
    (2, "spur", [(1.0, 1.0), (2.0, 2.5)]),
]

AREAS = [
    (1, "plain", [[[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]]),
    (2, "holed+twin", [
        [[(20, 20), (40, 20), (40, 40), (20, 40), (20, 20)],
         [(25, 25), (30, 25), (30, 30), (25, 30), (25, 25)]],
        [[(50, 0), (60, 0), (55, 8), (50, 0)]],
    ]),
]


def build():
    if os.path.exists(OUT):
        os.remove(OUT)
    con = sqlite3.connect(OUT)
    cur = con.cursor()
    cur.execute("""CREATE TABLE geometry_columns (
        f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT NULL,
        geometry_type INTEGER NOT NULL, coord_dimension INTEGER NOT NULL,
        srid INTEGER NOT NULL, spatial_index_enabled INTEGER NOT NULL)""")
    cur.execute("""CREATE TABLE spatial_ref_sys (
        srid INTEGER PRIMARY KEY, auth_name TEXT, auth_srid INTEGER,
        ref_sys_name TEXT, proj4text TEXT)""")
    cur.execute("INSERT INTO spatial_ref_sys VALUES (4326,'epsg',4326,'WGS 84','+proj=longlat')")

    cur.execute("""CREATE TABLE places (pk INTEGER PRIMARY KEY, name TEXT,
        pop INTEGER, score REAL, geometry BLOB)""")
    for (pk, nm, pop, sc, xy) in PLACES:
        blob = None if xy is None else gaia(1, pt_body(*xy), [xy])
        cur.execute("INSERT INTO places VALUES (?,?,?,?,?)", (pk, nm, pop, sc, blob))
    cur.execute("INSERT INTO geometry_columns VALUES ('places','geometry',1,2,4326,0)")

    cur.execute("CREATE TABLE routes (pk INTEGER PRIMARY KEY, name TEXT, geometry BLOB)")
    for (pk, nm, pts) in ROUTES:
        cur.execute("INSERT INTO routes VALUES (?,?,?)",
                    (pk, nm, gaia(2, line_body(pts, ">"), pts, ">")))
    cur.execute("INSERT INTO geometry_columns VALUES ('routes','geometry',2,2,4326,0)")

    cur.execute("CREATE TABLE areas (pk INTEGER PRIMARY KEY, name TEXT, geometry BLOB)")
    for (pk, nm, polys) in AREAS:
        coords = [c for rings in polys for r in rings for c in r]
        cur.execute("INSERT INTO areas VALUES (?,?,?)",
                    (pk, nm, gaia(6, mpoly_body(polys), coords)))
    cur.execute("INSERT INTO geometry_columns VALUES ('areas','geometry',6,2,4326,0)")
    con.commit()
    con.close()


def golden():
    rows = []
    for (pk, nm, pop, sc, xy) in PLACES:
        if xy is None:
            rows.append(("places", pk, nm, "", 0, "", "", "", ""))
        else:
            rows.append(("places", pk, nm, "POINT", 1, xy[0], xy[1], xy[0], xy[1]))
    for (pk, nm, pts) in ROUTES:
        rows.append(("routes", pk, nm, "LINESTRING", len(pts),
                     min(x for x, _ in pts), min(y for _, y in pts),
                     max(x for x, _ in pts), max(y for _, y in pts)))
    for (pk, nm, polys) in AREAS:
        cs = [c for rings in polys for r in rings for c in r]
        rows.append(("areas", pk, nm, "MULTIPOLYGON", len(cs),
                     min(float(x) for x, _ in cs), min(float(y) for _, y in cs),
                     max(float(x) for x, _ in cs), max(float(y) for _, y in cs)))
    with open(GOLDEN, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["layer", "rowid", "name", "gtype", "npts", "x0", "y0", "x1", "y1"])
        for r in rows:
            w.writerow(r)


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    build()
    golden()
    print("wrote", OUT, "and", GOLDEN)
