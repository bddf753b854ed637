#!/usr/bin/env python3
"""Writes GMT ASCII fixtures AND an independent golden for q_src_gmt:
the fixtures are authored here from the published GMT/OGR ASCII layout
(one file per collection geometry type), and the expected per-feature
rows (file, name, id, geometry type, point count, bbox) are computed
with python's own accounting — sharing no code with the Scala reader."""
import csv
import os

DIR = "src/test/resources/gmt"
OUT = "src/test/resources/golden/gmt_golden.csv"

# (name, id, segments) — each segment: (role, [(x, y)...]); role in
# {None, 'P', 'H'}; a non-first segment continues the same feature.
POLY = [
    ("plain", 1, [('P', [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])]),
    ("holed", 2, [('P', [(20, 20), (40, 20), (40, 40), (20, 40), (20, 20)]),
                  ('H', [(25, 25), (30, 25), (30, 30), (25, 30), (25, 25)])]),
]
MPOLY = [
    ("twin", 7, [('P', [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]),
                 ('P', [(10, 10), (14, 10), (14, 14), (10, 14), (10, 10)]),
                 ('H', [(11, 11), (12, 11), (12, 12), (11, 12), (11, 11)])]),
    ("single", 8, [('P', [(50, 0), (60, 0), (55, 8), (50, 0)])]),
]
LINES = [
    ("river", 3, [(None, [(0.5, 1.25), (3, 2), (7, -1)])]),
    ("road", 4, [(None, [(10, 10), (20, 10)])]),
]
MLINES = [
    ("braided", 9, [(None, [(0, 0), (5, 5)]), (None, [(1, 0), (6, 5), (7, 7)])]),
]
POINTS = [
    ("alpha", 5, [(None, [(4.5, -2.25)])]),
    ("beta", 6, [(None, [(100, 200)])]),
]


def write_gmt(path, gtype, feats):
    lines = ["# @VGMT1.0 @G" + gtype + " @Nname|id @Tstring|integer",
             "# FEATURE_DATA"]
    for name, fid, segs in feats:
        first = True
        for role, cs in segs:
            lines.append(">")
            if first:
                lines.append(f'# @D"{name}"|{fid}')
                first = False
            if role:
                lines.append("# @" + role)
            for x, y in cs:
                lines.append(f"{x} {y}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def bbox_npts(segs, gtype):
    pts = [p for _, cs in segs for p in cs]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    # ring auto-close: the scala reader closes open rings; all fixture
    # rings here are explicitly closed, so npts is the literal count
    return len(pts), min(xs), min(ys), max(xs), max(ys)


def main():
    os.makedirs(DIR, exist_ok=True)
    rows = []
    for fname, gtype, feats, gt_out in [
            ("poly.gmt", "POLYGON", POLY, "POLYGON"),
            ("mpoly.gmt", "MULTIPOLYGON", MPOLY, "MULTIPOLYGON"),
            ("lines.gmt", "LINESTRING", LINES, "LINESTRING"),
            ("mlines.gmt", "MULTILINESTRING", MLINES, "MULTILINESTRING"),
            ("points.gmt", "POINT", POINTS, "POINT")]:
        write_gmt(os.path.join(DIR, fname), gtype, feats)
        for name, fid, segs in feats:
            npts, x0, y0, x1, y1 = bbox_npts(segs, gtype)
            rows.append({"file": fname, "name": name, "id": fid,
                         "gtype": gt_out, "npts": npts,
                         "x0": x0, "y0": y0, "x1": x1, "y1": y1})
    with open(OUT, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "file", "name", "id", "gtype", "npts", "x0", "y0", "x1", "y1"])
        w.writeheader()
        for r in sorted(rows, key=lambda r: r["id"]):
            w.writerow(r)
    print(f"wrote {DIR}/*.gmt and {OUT} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
