#!/usr/bin/env python3
"""Independent golden for q_src_gml: parse the committed GML fixture
with python's xml.etree and compute per-feature layer/fid/name/srs,
geometry type, point count and bbox — sharing no code with the Scala
StAX reader."""
import csv
import re
import xml.etree.ElementTree as ET

GML = "{http://www.opengis.net/gml}"
APP = "{http://example.com/app}"
SRC = "src/test/resources/gml/sample.gml"
OUT = "src/test/resources/golden/gml_golden.csv"

GEOM_TAGS = {"Point", "LineString", "LinearRing", "Polygon", "Curve",
             "MultiPoint", "MultiCurve", "MultiLineString", "MultiSurface",
             "MultiPolygon", "MultiGeometry"}


def local(el):
    return el.tag.rsplit("}", 1)[-1]


def norm_srs(s):
    if s is None:
        return None
    m = re.search(r"(?i)epsg.*?([0-9]+)\s*$", s.strip())
    return "EPSG:" + m.group(1) if m else s.strip()


def pos_list(el):
    """coords from posList / pos children / GML2 coordinates of el."""
    out = []
    for pl in el.findall(GML + "posList"):
        dim = int(pl.get("srsDimension", "2"))
        toks = (pl.text or "").split()
        for i in range(0, len(toks) - dim + 1, dim):
            out.append((float(toks[i]), float(toks[i + 1])))
    for p in el.findall(GML + "pos"):
        t = (p.text or "").split()
        if len(t) >= 2:
            out.append((float(t[0]), float(t[1])))
    for c in el.findall(GML + "coordinates"):
        cs, ts = c.get("cs", ","), c.get("ts", " ")
        for tup in (c.text or "").replace(ts, " ").split():
            p = tup.split(cs)
            if len(p) >= 2:
                out.append((float(p[0]), float(p[1])))
    return out


def geom_info(el):
    """-> (gtype, npts, coords)"""
    tag = local(el)
    if tag == "Point":
        cs = pos_list(el)
        return ("POINT", len(cs), cs)
    if tag in ("LineString", "LinearRing"):
        cs = pos_list(el)
        return ("LINESTRING" if tag == "LineString" else "LINEARRING", len(cs), cs)
    if tag == "Curve":
        cs = []
        for seg in el.iter(GML + "LineStringSegment"):
            sc = pos_list(seg)
            # adjacent segments share their boundary vertex
            if cs and sc and sc[0] == cs[-1]:
                sc = sc[1:]
            cs.extend(sc)
        return ("LINESTRING", len(cs), cs)
    if tag == "Polygon":
        cs = []
        for b in ("exterior", "outerBoundaryIs", "interior", "innerBoundaryIs"):
            for bd in el.findall(GML + b):
                for lr in bd.findall(GML + "LinearRing"):
                    cs.extend(pos_list(lr))
        return ("POLYGON", len(cs), cs)
    if tag in ("MultiSurface", "MultiPolygon"):
        cs = []
        n = 0
        for p in el.iter(GML + "Polygon"):
            gi = geom_info(p)
            n += gi[1]
            cs.extend(gi[2])
        return ("MULTIPOLYGON", n, cs)
    if tag in ("MultiCurve", "MultiLineString"):
        cs = []
        n = 0
        for p in list(el.iter(GML + "LineString")) + list(el.iter(GML + "Curve")):
            gi = geom_info(p)
            n += gi[1]
            cs.extend(gi[2])
        return ("MULTILINESTRING", n, cs)
    if tag == "MultiPoint":
        cs = []
        for p in el.iter(GML + "Point"):
            cs.extend(pos_list(p))
        return ("MULTIPOINT", len(cs), cs)
    return (None, 0, [])


def features(root):
    for member in root:
        if local(member) in ("featureMember", "member", "featureMembers"):
            for f in member:
                yield f


rows = []
root = ET.parse(SRC).getroot()
for f in features(root):
    layer = local(f)
    fid = f.get(GML + "id") or f.get("fid")
    name = None
    srs = None
    gi = (None, 0, [])
    for ch in f:
        if local(ch) == "name" and ch.text:
            name = ch.text.strip()
        # geometry may sit under any wrapper property
        for g in ch.iter():
            if local(g) in GEOM_TAGS:
                if srs is None:
                    srs = norm_srs(g.get("srsName"))
                gi = geom_info(g)
                break
        else:
            continue
    gtype, npts, cs = gi
    xs = [c[0] for c in cs]
    ys = [c[1] for c in cs]
    rows.append({
        "layer": layer, "fid": fid, "name": name, "srs": srs,
        "gtype": gtype, "npts": npts,
        "x0": min(xs), "y0": min(ys), "x1": max(xs), "y1": max(ys)})

rows.sort(key=lambda r: (r["layer"], r["fid"]))
with open(OUT, "w", newline="") as fh:
    w = csv.DictWriter(fh, fieldnames=["layer", "fid", "name", "srs", "gtype",
                                       "npts", "x0", "y0", "x1", "y1"])
    w.writeheader()
    w.writerows(rows)
print(f"wrote {len(rows)} rows to {OUT}")
