#!/usr/bin/env python3
"""Independent golden for q_src_kml: parse the committed KML fixture
with python's xml.etree and compute per-placemark folder path, geometry
type/point-count/bbox, and the 'state' ExtendedData key — sharing no
code with the Scala StAX reader."""
import csv
import xml.etree.ElementTree as ET

NS = "{http://www.opengis.net/kml/2.2}"
SRC = "src/test/resources/kml/sample.kml"
OUT = "src/test/resources/golden/kml_golden.csv"

GEOM_TAGS = ("Point", "LineString", "LinearRing", "Polygon", "MultiGeometry")


def coords(el):
    c = el.find(NS + "coordinates")
    if c is None or c.text is None:
        return []
    out = []
    for tup in c.text.split():
        p = tup.split(",")
        if len(p) >= 2:
            out.append((float(p[0]), float(p[1])))
    return out


def geom_info(el):
    """-> (type_tag, npoints, flat list of (x, y))"""
    tag = el.tag.replace(NS, "")
    if tag == "Point":
        cs = coords(el)
        return ("POINT", len(cs), cs)
    if tag == "LineString":
        cs = coords(el)
        return ("LINESTRING", len(cs), cs)
    if tag == "LinearRing":
        cs = coords(el)
        return ("LINEARRING", len(cs), cs)
    if tag == "Polygon":
        cs = []
        for b in ("outerBoundaryIs", "innerBoundaryIs"):
            for bd in el.findall(NS + b):
                for lr in bd.findall(NS + "LinearRing"):
                    cs.extend(coords(lr))
        return ("POLYGON", len(cs), cs)
    if tag == "MultiGeometry":
        parts = [geom_info(ch) for ch in el if ch.tag.replace(NS, "") in GEOM_TAGS]
        n = sum(p[1] for p in parts)
        cs = [xy for p in parts for xy in p[2]]
        kinds = {p[0] for p in parts}
        t = ("MULTIPOINT" if kinds == {"POINT"} else
             "MULTILINESTRING" if kinds == {"LINESTRING"} else
             "MULTIPOLYGON" if kinds == {"POLYGON"} else "GEOMETRYCOLLECTION")
        return (t, n, cs)
    return (None, 0, [])


rows = []


def walk(el, path):
    tag = el.tag.replace(NS, "")
    if tag in ("Document", "Folder"):
        nm = el.find(NS + "name")
        name = "" if nm is None or nm.text is None else nm.text.strip()
        path = path + [name] if name else path
    for ch in el:
        ctag = ch.tag.replace(NS, "")
        if ctag == "Placemark":
            nm = ch.find(NS + "name")
            name = None if nm is None or nm.text is None else nm.text.strip()
            gi = (None, 0, [])
            for g in ch:
                if g.tag.replace(NS, "") in GEOM_TAGS:
                    gi = geom_info(g)
            state = None
            ed = ch.find(NS + "ExtendedData")
            if ed is not None:
                for d in ed.findall(NS + "Data"):
                    if d.get("name") == "state":
                        v = d.find(NS + "value")
                        state = "" if v is None or v.text is None else v.text.strip()
            xs = [c[0] for c in gi[2]]
            ys = [c[1] for c in gi[2]]
            rows.append(["/".join(path), name, gi[0], gi[1],
                         repr(min(xs)) if xs else None,
                         repr(max(ys)) if ys else None, state])
        elif ctag in ("Document", "Folder"):
            walk(ch, path)


root = ET.parse(SRC).getroot()
walk(root, [])
rows.sort(key=lambda r: (r[0], r[1] or ""))
with open(OUT, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["folder", "name", "gtype", "npts", "x0", "y1", "state"])
    w.writerows(rows)
print(f"wrote {len(rows)} rows to {OUT}")
