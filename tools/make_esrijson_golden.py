#!/usr/bin/env python3
"""Independent golden for q_src_esrijson: parse the committed ESRI JSON
fixtures with python's json module and derive per-feature geometry
type / point count / bbox straight from the published FeatureSet rules
(x/points/paths/rings forms, clockwise ring = shell) — sharing no code
with the Scala reader."""
import csv
import json
import os

SRCDIR = "src/test/resources/esri"
OUT = "src/test/resources/golden/esrijson_golden.csv"


def shoelace(ring):
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return a / 2.0


def info(g):
    """-> (gtype, npts, flat coord list) per the documented mapping."""
    if "x" in g:
        if g["x"] is None:
            return ("POINT", 0, [])
        return ("POINT", 1, [(g["x"], g["y"])])
    if "points" in g:
        return ("MULTIPOINT", len(g["points"]), [tuple(p) for p in g["points"]])
    if "paths" in g:
        cs = [tuple(p) for path in g["paths"] for p in path]
        t = "LINESTRING" if len(g["paths"]) == 1 else "MULTILINESTRING"
        return (t, len(cs), cs)
    if "rings" in g:
        rings = []
        for r in g["rings"]:
            rr = [tuple(p) for p in r]
            if rr[0] != rr[-1]:
                rr.append(rr[0])
            rings.append(rr)
        shells = sum(1 for r in rings if shoelace(r) < 0)
        # counter-clockwise rings not contained in any clockwise shell
        # promote to shells (the reader's documented orphan rule); the
        # fixtures only contain either contained holes or fully orphan
        # rings, so containment here is a simple bbox test
        def inside(pt, r):
            xs = [p[0] for p in r]
            ys = [p[1] for p in r]
            return min(xs) <= pt[0] <= max(xs) and min(ys) <= pt[1] <= max(ys)
        for r in rings:
            if shoelace(r) >= 0:
                cw = [s for s in rings if shoelace(s) < 0]
                if not any(inside(r[0], s) for s in cw):
                    shells += 1
        cs = [p for r in rings for p in r]
        t = "POLYGON" if shells == 1 else "MULTIPOLYGON"
        return (t, len(cs), cs)
    raise ValueError(f"unknown geometry {g}")


rows = []
for fn in sorted(os.listdir(SRCDIR)):
    if not fn.endswith(".json"):
        continue
    layer = fn[:-5]
    doc = json.load(open(os.path.join(SRCDIR, fn)))
    for f in doc["features"]:
        gtype, npts, cs = info(f["geometry"])
        a = f["attributes"]
        rows.append({
            "layer": layer,
            "name": a["name"],
            "val": str(a["val"]),
            "gtype": gtype,
            "npts": npts,
            "x0": min(c[0] for c in cs) if cs else None,
            "y1": max(c[1] for c in cs) if cs else None,
        })

rows.sort(key=lambda r: (r["layer"], r["name"]))
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w", newline="") as fh:
    w = csv.DictWriter(fh, fieldnames=["layer", "name", "val", "gtype",
                                       "npts", "x0", "y1"])
    w.writeheader()
    w.writerows(rows)
print(f"wrote {len(rows)} rows to {OUT}")
