#!/usr/bin/env python3
"""Writes the DXF fixture AND an independent golden for q_src_dxf: the
fixture is authored here as raw group-code pairs from the published
Autodesk DXF layout, and the expected per-entity rows (layer, handle,
linetype, text, geometry type, point count, bbox) are computed with
python's own math — sharing no code with the Scala reader. Circle =
32 segments from angle 0; arc = ceil(sweep/11.25 deg) segments (min 2),
matching the documented deterministic approximation contract."""
import csv
import math
import os

SRC = "src/test/resources/dxf/sample.dxf"
OUT = "src/test/resources/golden/dxf_golden.csv"

CIRCLE_SEGMENTS = 32
ARC_SEGMENT_DEG = 11.25


def pairs(*cv):
    return list(cv)


# ---- fixture entities: (kind, [(code, value)...]) ------------------------
ENTITIES = [
    ("POINT", [(5, "A1"), (8, "sites"), (10, "4.25"), (20, "-1.5"), (30, "7.0")]),
    ("POINT", [(5, "A2"), (8, "sites"), (6, "DASHED"), (10, "100"), (20, "200")]),
    ("LINE", [(5, "B1"), (8, "roads"), (10, "0"), (20, "0"), (11, "10"), (21, "5")]),
    ("LWPOLYLINE", [(5, "C1"), (8, "roads"), (90, "4"), (70, "0"),
                    (10, "0"), (20, "0"), (10, "1"), (20, "2"),
                    (10, "3"), (20, "2"), (10, "4"), (20, "0")]),
    # closed -> polygon (ring auto-closed)
    ("LWPOLYLINE", [(5, "C2"), (8, "parcels"), (90, "4"), (70, "1"),
                    (10, "10"), (20, "10"), (10, "14"), (20, "10"),
                    (10, "14"), (20, "13"), (10, "10"), (20, "13")]),
    ("CIRCLE", [(5, "D1"), (8, "wells"), (10, "50"), (20, "60"), (40, "2.5")]),
    ("ARC", [(5, "D2"), (8, "wells"), (10, "0"), (20, "0"), (40, "10"),
             (50, "45"), (51, "135")]),
    # arc crossing 0 degrees (end < start)
    ("ARC", [(5, "D3"), (8, "wells"), (10, "5"), (20, "5"), (40, "1"),
             (50, "300"), (51, "60")]),
    ("TEXT", [(5, "E1"), (8, "labels"), (10, "7"), (20, "8"), (40, "1.5"),
              (1, "Main Street")]),
    ("MTEXT", [(5, "E2"), (8, "labels"), (10, "9"), (20, "1"),
               (1, "Block 7")]),
]

# POLYLINE + VERTEX*3 + SEQEND (closed flag set)
POLYLINE_RUN = [
    ("POLYLINE", [(5, "F1"), (8, "parcels"), (70, "1"), (66, "1")]),
    ("VERTEX", [(5, "F2"), (8, "parcels"), (10, "20"), (20, "20")]),
    ("VERTEX", [(5, "F3"), (8, "parcels"), (10, "25"), (20, "20")]),
    ("VERTEX", [(5, "F4"), (8, "parcels"), (10, "22"), (20, "24")]),
    ("SEQEND", [(5, "F5"), (8, "parcels")]),
]


def write_fixture():
    os.makedirs(os.path.dirname(SRC), exist_ok=True)
    lines = []

    def emit(code, value):
        lines.append(str(code))
        lines.append(str(value))

    # minimal HEADER section (readers must skip it)
    emit(0, "SECTION"); emit(2, "HEADER")
    emit(9, "$ACADVER"); emit(1, "AC1015")
    emit(0, "ENDSEC")
    emit(0, "SECTION"); emit(2, "ENTITIES")
    for kind, cv in ENTITIES + POLYLINE_RUN:
        emit(0, kind)
        for c, v in cv:
            emit(c, v)
    emit(0, "ENDSEC")
    emit(0, "EOF")
    with open(SRC, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---- independent expected geometry ---------------------------------------
def circle_pts(cx, cy, r):
    pts = [(cx + r * math.cos(2 * math.pi * k / CIRCLE_SEGMENTS),
            cy + r * math.sin(2 * math.pi * k / CIRCLE_SEGMENTS))
           for k in range(CIRCLE_SEGMENTS)]
    return pts + [(cx + r, cy)]


def arc_pts(cx, cy, r, a0, a1):
    sweep = (a1 - a0) % 360.0
    if sweep <= 0:
        sweep += 360.0
    n = max(2, math.ceil(sweep / ARC_SEGMENT_DEG))
    return [(cx + r * math.cos(math.radians(a0 + sweep * k / n)),
             cy + r * math.sin(math.radians(a0 + sweep * k / n)))
            for k in range(n + 1)]


def expected_rows():
    rows = []

    def add(handle, layer, linetype, text, gtype, pts):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        rows.append({
            "handle": handle, "layer": layer, "linetype": linetype,
            "text": text, "gtype": gtype, "npts": len(pts),
            "x0": round(min(xs), 4), "y0": round(min(ys), 4),
            "x1": round(max(xs), 4), "y1": round(max(ys), 4)})

    add("A1", "sites", "", "", "POINT", [(4.25, -1.5)])
    add("A2", "sites", "DASHED", "", "POINT", [(100.0, 200.0)])
    add("B1", "roads", "", "", "LINESTRING", [(0, 0), (10, 5)])
    add("C1", "roads", "", "", "LINESTRING", [(0, 0), (1, 2), (3, 2), (4, 0)])
    add("C2", "parcels", "", "", "POLYGON",
        [(10, 10), (14, 10), (14, 13), (10, 13), (10, 10)])
    add("D1", "wells", "", "", "POLYGON", circle_pts(50, 60, 2.5))
    add("D2", "wells", "", "", "LINESTRING", arc_pts(0, 0, 10, 45, 135))
    add("D3", "wells", "", "", "LINESTRING", arc_pts(5, 5, 1, 300, 60))
    add("E1", "labels", "", "Main Street", "POINT", [(7.0, 8.0)])
    add("E2", "labels", "", "Block 7", "POINT", [(9.0, 1.0)])
    add("F1", "parcels", "", "", "POLYGON",
        [(20, 20), (25, 20), (22, 24), (20, 20)])
    return rows


def main():
    write_fixture()
    rows = expected_rows()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "handle", "layer", "linetype", "text", "gtype", "npts",
            "x0", "y0", "x1", "y1"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {SRC} and {OUT} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
