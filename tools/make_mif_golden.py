#!/usr/bin/env python3
"""Fixture + independent golden for q_src_mif: writes a MapInfo MIF/MID
pair exercising every supported record kind (POINT, LINE, PLINE,
PLINE MULTIPLE, REGION with hole, REGION multishell, RECT, NONE), then
computes the expected per-feature metadata (type tag, point count,
envelope) FROM THE SAME PYTHON DATA — sharing nothing with the Scala
parser. Run once at fixture-authoring time; commit both outputs; the
DuckDB oracle reads the CSV."""
import csv
import os

MIF = "src/test/resources/mif/sample.mif"
MID = "src/test/resources/mif/sample.mid"
OUT = "src/test/resources/golden/mif_golden.csv"

os.makedirs(os.path.dirname(MIF), exist_ok=True)

# (name, pop, area, active, born, kind, coords)
features = [
    ("alpha", 100, 1.5, "T", "20240101", "POINT", [(10.5, 20.25)]),
    ("beta quoted, comma", 200, 2.25, "F", "20230215", "LINE",
     [(0.0, 0.0), (5.0, 5.0)]),
    ("gamma", 300, 0.75, "T", "20220630", "PLINE",
     [(1.0, 1.0), (2.0, 3.0), (4.0, 2.5), (6.0, 4.0)]),
    ("delta", 400, 10.0, "F", "20210101", "PLINE_MULTIPLE",
     [[(0.0, 10.0), (1.0, 11.0), (2.0, 10.5)], [(5.0, 5.0), (6.0, 6.5)]]),
    ("epsilon", 500, 42.0, "T", "20200229", "REGION_HOLE",
     [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
      [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)]]),
    ("zeta", 600, 7.0, "F", "20190315", "REGION_TWO",
     [[(20.0, 20.0), (25.0, 20.0), (25.0, 25.0), (20.0, 25.0)],
      [(30.0, 30.0), (32.0, 30.0), (32.0, 33.0), (30.0, 33.0)]]),
    ("eta", 700, 3.5, "T", "20180704", "RECT", [(1.0, 2.0), (4.0, 6.0)]),
    ("theta", 800, 0.0, "F", "20170101", "NONE", []),
]


def fmt(v):
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


with open(MIF, "w") as f:
    f.write('VERSION 300\nCharset "WindowsLatin1"\nDELIMITER ","\n')
    f.write("COLUMNS 5\n  name Char(30)\n  pop Integer\n  area Float\n")
    f.write("  active Logical\n  born Date\nDATA\n")
    for name, pop, area, active, born, kind, coords in features:
        if kind == "POINT":
            f.write(f"POINT {fmt(coords[0][0])} {fmt(coords[0][1])}\n")
            f.write("    SYMBOL (34,0,12)\n")  # style clause: must be skipped
        elif kind == "LINE":
            (x1, y1), (x2, y2) = coords
            f.write(f"LINE {fmt(x1)} {fmt(y1)} {fmt(x2)} {fmt(y2)}\n")
            f.write("    PEN (1,2,0)\n")
        elif kind == "PLINE":
            f.write(f"PLINE {len(coords)}\n")
            for x, y in coords:
                f.write(f"{fmt(x)} {fmt(y)}\n")
        elif kind == "PLINE_MULTIPLE":
            f.write(f"PLINE MULTIPLE {len(coords)}\n")
            for sec in coords:
                f.write(f"  {len(sec)}\n")
                for x, y in sec:
                    f.write(f"{fmt(x)} {fmt(y)}\n")
            f.write("    PEN (1,2,0)\n    SMOOTH\n")
        elif kind in ("REGION_HOLE", "REGION_TWO"):
            f.write(f"REGION {len(coords)}\n")
            for ring in coords:
                f.write(f"  {len(ring)}\n")  # open ring: reader closes it
                for x, y in ring:
                    f.write(f"{fmt(x)} {fmt(y)}\n")
            f.write("    BRUSH (2,16776960,16711680)\n")
            f.write("    CENTER 5 5\n")
        elif kind == "RECT":
            (x1, y1), (x2, y2) = coords
            f.write(f"RECT {fmt(x1)} {fmt(y1)} {fmt(x2)} {fmt(y2)}\n")
        elif kind == "NONE":
            f.write("NONE\n")

with open(MID, "w") as f:
    for name, pop, area, active, born, kind, coords in features:
        quoted = '"' + name.replace('"', '""') + '"'
        f.write(f"{quoted},{pop},{fmt(area)},{active},{born}\n")


def flat(kind, coords):
    if kind in ("PLINE_MULTIPLE",):
        return [p for sec in coords for p in sec]
    if kind in ("REGION_HOLE", "REGION_TWO"):
        # reader closes each open ring -> +1 point per ring
        return [p for ring in coords for p in (ring + [ring[0]])]
    if kind == "RECT":
        (x1, y1), (x2, y2) = coords
        lx, hx, ly, hy = min(x1, x2), max(x1, x2), min(y1, y2), max(y1, y2)
        return [(lx, ly), (hx, ly), (hx, hy), (lx, hy), (lx, ly)]
    return coords


TYPE = {"POINT": "POINT", "LINE": "LINESTRING", "PLINE": "LINESTRING",
        "PLINE_MULTIPLE": "MULTILINESTRING", "REGION_HOLE": "POLYGON",
        "REGION_TWO": "MULTIPOLYGON", "RECT": "POLYGON", "NONE": None}

rows = []
for name, pop, area, active, born, kind, coords in features:
    pts = flat(kind, coords)
    if kind == "NONE":
        rows.append([name, pop, fmt(area), active == "T", born,
                     None, None, None, None, None, None])
    else:
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        rows.append([name, pop, fmt(area), active == "T", born,
                     TYPE[kind], len(pts),
                     fmt(min(xs)), fmt(min(ys)), fmt(max(xs)), fmt(max(ys))])
rows.sort(key=lambda r: r[0])

with open(OUT, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["name", "pop", "area", "active", "born",
                "gtype", "npts", "minx", "miny", "maxx", "maxy"])
    w.writerows(rows)

print(f"wrote {MIF}, {MID}, {OUT} ({len(rows)} features)")
