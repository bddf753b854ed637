#!/usr/bin/env python3
"""Writes TopoJSON fixtures AND an independent golden for
q_src_topojson.

Fixtures are authored from the published topojson.org specification:
`quantized.topojson` carries a transform (scale+translate) with
delta-encoded integer arcs, two polygons SHARING their border arc (one
traversing it reversed via the ~complement index), a two-arc stitched
LineString, and Point/MultiPoint members; `plain.topojson` has no
transform (raw float positions). The golden rows (layer, id, name,
gtype, npts, bbox) are computed by this script's own arc
decode/stitch accounting — decoded coordinates use the same
q*scale+translate double arithmetic the reader performs, so values
hash-match exactly. Shares no code with the Scala reader.
"""
import csv
import json
import os

DIR = "src/test/resources/topojson"
OUT = "src/test/resources/golden/topojson_golden.csv"

SCALE = [0.01, 0.005]
TRANSLATE = [-10.0, 40.0]

# arcs as ABSOLUTE integer grid positions; the builder delta-encodes
ARCS_Q = [
    # 0: shared border of the two "counties" (S->N)
    [(500, 100), (510, 300), (500, 500)],
    # 1: west ring remainder (N->S the long way west)
    [(500, 500), (100, 480), (120, 90), (500, 100)],
    # 2: east ring remainder (S->N the long way east)
    [(500, 100), (900, 120), (880, 510), (500, 500)],
    # 3-4: road pieces that stitch (junction position repeats)
    [(0, 0), (200, 100), (400, 150)],
    [(400, 150), (600, 400)],
]


def decode_arc(a):
    return [(q[0] * SCALE[0] + TRANSLATE[0], q[1] * SCALE[1] + TRANSLATE[1]) for q in a]


def stitch(idxs):
    out = []
    for i in idxs:
        arc = decode_arc(ARCS_Q[i]) if i >= 0 else list(reversed(decode_arc(ARCS_Q[~i])))
        if out and arc and arc[0] == out[-1]:
            arc = arc[1:]
        out.extend(arc)
    return out


def close_ring(cs):
    return cs if cs[0] == cs[-1] else cs + [cs[0]]


def delta(a):
    out = []
    px = py = 0
    for (x, y) in a:
        out.append([x - px, y - py])
        px, py = x, y
    return out


def qpt(x, y):
    return [round((x - TRANSLATE[0]) / SCALE[0]), round((y - TRANSLATE[1]) / SCALE[1])]


def build():
    os.makedirs(DIR, exist_ok=True)
    # west county: west remainder (N->W->S) then the shared border
    # northward; east county: the border REVERSED (N->S, via the ~
    # complement) then the east remainder northward — both rings
    # stitch end-to-start and close exactly
    west_ring = [1, 0]
    east_ring = [~0, 2]
    pt_a = (-8.5, 41.25)
    pt_b = (-6.25, 42.5)
    topo = {
        "type": "Topology",
        "transform": {"scale": SCALE, "translate": TRANSLATE},
        "objects": {
            "counties": {
                "type": "GeometryCollection",
                "geometries": [
                    {"type": "Polygon", "arcs": [west_ring], "id": "W",
                     "properties": {"name": "west", "pop": 100}},
                    {"type": "Polygon", "arcs": [east_ring], "id": "E",
                     "properties": {"name": "east", "pop": 200}},
                ],
            },
            "roads": {"type": "LineString", "arcs": [3, 4], "id": "R1",
                      "properties": {"name": "main"}},
            "places": {
                "type": "GeometryCollection",
                "geometries": [
                    {"type": "Point", "coordinates": qpt(*pt_a), "id": "P1",
                     "properties": {"name": "á-town"}},
                    {"type": "MultiPoint",
                     "coordinates": [qpt(*pt_b), qpt(pt_b[0] + 1.0, pt_b[1])],
                     "id": "P2", "properties": {"name": "pair"}},
                ],
            },
        },
        "arcs": [delta(a) for a in ARCS_Q],
    }
    with open(os.path.join(DIR, "quantized.topojson"), "w") as f:
        json.dump(topo, f)

    plain = {
        "type": "Topology",
        "objects": {
            "plain": {"type": "Polygon", "arcs": [[0]], "id": "T",
                      "properties": {"name": "tri"}},
        },
        "arcs": [[[0.0, 0.0], [4.0, 0.0], [2.0, 3.0], [0.0, 0.0]]],
    }
    with open(os.path.join(DIR, "plain.topojson"), "w") as f:
        json.dump(plain, f)

    # ---- golden -----------------------------------------------------------
    rows = []
    for (gid, name, ring) in [("W", "west", west_ring), ("E", "east", east_ring)]:
        cs = close_ring(stitch(ring))
        xs = [x for x, _ in cs]
        ys = [y for _, y in cs]
        rows.append(("quantized.topojson", "counties", gid, name, "POLYGON",
                     len(cs), min(xs), min(ys), max(xs), max(ys)))
    cs = stitch([3, 4])
    rows.append(("quantized.topojson", "roads", "R1", "main", "LINESTRING",
                 len(cs), min(x for x, _ in cs), min(y for _, y in cs),
                 max(x for x, _ in cs), max(y for _, y in cs)))

    def q2c(q):
        return (q[0] * SCALE[0] + TRANSLATE[0], q[1] * SCALE[1] + TRANSLATE[1])
    pa = q2c(qpt(*pt_a))
    rows.append(("quantized.topojson", "places", "P1", "á-town", "POINT",
                 1, pa[0], pa[1], pa[0], pa[1]))
    pb1 = q2c(qpt(*pt_b))
    pb2 = q2c(qpt(pt_b[0] + 1.0, pt_b[1]))
    rows.append(("quantized.topojson", "places", "P2", "pair", "MULTIPOINT", 2,
                 min(pb1[0], pb2[0]), min(pb1[1], pb2[1]),
                 max(pb1[0], pb2[0]), max(pb1[1], pb2[1])))
    rows.append(("plain.topojson", "plain", "T", "tri", "POLYGON", 4,
                 0.0, 0.0, 4.0, 3.0))
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "layer", "id", "name", "gtype", "npts", "x0", "y0", "x1", "y1"])
        for r in rows:
            w.writerow(r)


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    build()
    print("wrote", DIR, "and", OUT)
