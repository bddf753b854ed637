#!/usr/bin/env python3
"""Independent golden for q_src_gpx: parse the committed GPX fixture
with python's xml.etree (a from-scratch parser sharing nothing with the
Scala StAX reader) and emit the flat normalized layer union the query
produces. Layout mirrors tools/make_gpkg_fixture.py's role: run once at
fixture-authoring time, commit the CSV, the DuckDB oracle reads it."""
import csv
import xml.etree.ElementTree as ET

NS = "{http://www.topografix.com/GPX/1/1}"
SRC = "src/test/resources/gpx/sample.gpx"
OUT = "src/test/resources/golden/gpx_golden.csv"


def txt(el, tag):
    c = el.find(NS + tag)
    return None if c is None or c.text is None else c.text.strip()


def fnum(s):
    # shortest round-trip repr; DuckDB read_csv and Scala toDouble both
    # recover the identical binary double
    return repr(float(s))


rows = []
root = ET.parse(SRC).getroot()

for w in root.findall(NS + "wpt"):
    rows.append(["waypoints", -1, -1, -1, txt(w, "name"),
                 None if txt(w, "ele") is None else fnum(txt(w, "ele")),
                 txt(w, "time"), fnum(w.get("lon")), fnum(w.get("lat")), 1])

for rfid, rte in enumerate(root.findall(NS + "rte")):
    pts = rte.findall(NS + "rtept")
    num = txt(rte, "number")
    if len(pts) >= 2:
        lons = [float(p.get("lon")) for p in pts]
        lats = [float(p.get("lat")) for p in pts]
        rows.append(["routes", -1 if num is None else int(num), -1, -1,
                     txt(rte, "name"), None, None,
                     repr(min(lons)), repr(max(lats)), len(pts)])
    for i, p in enumerate(pts):
        rows.append(["route_points", rfid, i, -1, txt(p, "name"),
                     None if txt(p, "ele") is None else fnum(txt(p, "ele")),
                     None, fnum(p.get("lon")), fnum(p.get("lat")), 1])

for tfid, trk in enumerate(root.findall(NS + "trk")):
    num = txt(trk, "number")
    segs = [s.findall(NS + "trkpt") for s in trk.findall(NS + "trkseg")]
    live = [s for s in segs if len(s) >= 2]
    if live:
        lons = [float(p.get("lon")) for s in live for p in s]
        lats = [float(p.get("lat")) for s in live for p in s]
        rows.append(["tracks", -1 if num is None else int(num), -1, -1,
                     txt(trk, "name"), None, None,
                     repr(min(lons)), repr(max(lats)),
                     sum(len(s) for s in live)])
    for si, seg in enumerate(segs):
        for pi, p in enumerate(seg):
            rows.append(["track_points", tfid, si, pi, None,
                         None if txt(p, "ele") is None else fnum(txt(p, "ele")),
                         txt(p, "time"), fnum(p.get("lon")), fnum(p.get("lat")), 1])

rows.sort(key=lambda r: (r[0], r[1], r[2], r[3], r[4] or ""))
with open(OUT, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["layer", "a", "b", "c", "name", "ele", "time", "x", "y", "npts"])
    w.writerows(rows)
print(f"wrote {len(rows)} rows to {OUT}")
