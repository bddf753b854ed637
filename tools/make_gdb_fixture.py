#!/usr/bin/env python3
"""Builds an ESRI File Geodatabase (OpenFileGDB) fixture AND an
independent golden for q_src_gdb.

The container is authored here from the published reverse-engineered
FGDB table-format specification (the spec GDAL's OpenFileGDB driver
implements): a .gdb directory of a%08x.gdbtable/.gdbtablx pairs, with
a00000001 = GDB_SystemCatalog mapping table names to file numbers.
This builder shares no code with the Scala reader — it is the
independent-implementation golden, same contract as make_shp_golden.py.

Layout written (all little-endian):

.gdbtable   40-byte header (magic=3, n_valid_rows, 3 unknown int32s,
            int32 0, int64 file_size, int64 field-desc offset), field
            description section (int32 remaining-bytes, int32
            version=4, geometry-type byte + 3 flag bytes, int16
            nfields, per-field descriptors), then rows as
            int32-size-prefixed blobs: null bitmap over the nullable
            fields (LSB-first), then values in field order (OID is
            implicit, never stored).
.gdbtablx   16-byte header (magic=3, n 1024-row blocks, n_rows,
            bytes-per-offset=5), then blocks*1024 5-byte offsets
            (0 = absent row), then a 16-byte trailer (zeros — dense
            files carry no block map).

Field descriptors: uint8 name-chars + UTF-16LE name, same for alias,
uint8 type (0 int16, 1 int32, 2 float32, 3 float64, 4 string,
5 datetime, 6 objectid, 7 geometry), then a type payload — width/flags
for numerics (flags bit0 = nullable, bit2 = has-default), int32
max-length + flags for strings, and for geometry: flags, uint16
WKT-chars + UTF-16LE SRS WKT, a Z/M flag byte, xorigin/yorigin/xyscale
doubles, xytolerance, the xmin/ymin/xmax/ymax extent, then
0x00 + int32 grid-count + grid-size doubles (spatial index grids).

Geometry blobs are the Esri compressed shape format: varuint shape
type (1 point, 8 multipoint, 3 polyline, 5 polygon), point coords as
varuint round((v - origin) * scale) + 1, multipart shapes as varuint
npoints/nparts, a scaled-varuint bbox (xmin, ymin, width, height),
nparts-1 per-part counts, then per-vertex deltas as the spec's signed
varints (sign bit = 0x40 of the FIRST byte, continuation = 0x80),
deltas running ACROSS parts. Datetimes are float64 days since
1899-12-30.
"""
import csv
import os
import shutil
import struct

DIR = "src/test/resources/filegdb/sample.gdb"
OUT = "src/test/resources/golden/gdb_golden.csv"

XYSCALE = 10000.0
XORIGIN = -400.0
YORIGIN = -400.0


def varuint(n):
    assert n >= 0
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint(n):
    """FGDB signed varint: first byte has sign in 0x40 and 6 value
    bits; later bytes 7 value bits; 0x80 = continuation everywhere."""
    sign = 0x40 if n < 0 else 0
    n = -n if n < 0 else n
    first = (n & 0x3F) | sign
    n >>= 6
    out = bytearray()
    if n:
        out.append(first | 0x80)
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    else:
        out.append(first)
    return bytes(out)


def utf16_name(s):
    b = s.encode("utf-16-le")
    assert len(b) // 2 < 256
    return bytes([len(b) // 2]) + b


def scaled(v, origin):
    return round((v - origin) * XYSCALE)


def field_desc(name, ftype, nullable=True, alias=""):
    flags = 1 if nullable else 0
    d = utf16_name(name) + utf16_name(alias) + bytes([ftype])
    if ftype == 6:      # objectid
        d += bytes([4, 2])
    elif ftype == 4:    # string
        d += struct.pack("<i", 254) + bytes([flags])
    elif ftype in (0, 1, 2, 3, 5):
        width = {0: 2, 1: 4, 2: 4, 3: 8, 5: 8}[ftype]
        d += bytes([width, flags])
    else:
        raise ValueError(ftype)
    return d


def geom_field_desc(name, wkt, nullable=True):
    d = utf16_name(name) + utf16_name("") + bytes([7])
    d += bytes([0, 1 if nullable else 0])
    w = wkt.encode("utf-16-le")
    d += struct.pack("<H", len(w) // 2) + w
    d += bytes([0])  # no Z, no M
    d += struct.pack("<d", XORIGIN) + struct.pack("<d", YORIGIN)
    d += struct.pack("<d", XYSCALE)
    d += struct.pack("<d", 0.001)            # xytolerance
    d += struct.pack("<4d", -180.0, -90.0, 180.0, 90.0)  # extent
    d += bytes([0]) + struct.pack("<i", 1) + struct.pack("<d", 0.0)  # grids
    return d


def pack_point(x, y):
    return varuint(1) + varuint(scaled(x, XORIGIN) + 1) + varuint(scaled(y, YORIGIN) + 1)


def pack_multipart(shape_type, parts):
    """parts: list of [(x, y), ...]. Deltas run across parts."""
    pts = [p for part in parts for p in part]
    xs = [scaled(x, XORIGIN) for x, _ in pts]
    ys = [scaled(y, YORIGIN) for _, y in pts]
    out = varuint(shape_type) + varuint(len(pts)) + varuint(len(parts))
    out += varuint(min(xs)) + varuint(min(ys))
    out += varuint(max(xs) - min(xs)) + varuint(max(ys) - min(ys))
    for part in parts[:-1]:
        out += varuint(len(part))
    px = py = 0
    for i in range(len(pts)):
        out += varint(xs[i] - px) + varint(ys[i] - py)
        px, py = xs[i], ys[i]
    return out


def pack_multipoint(coords):
    xs = [scaled(x, XORIGIN) for x, _ in coords]
    ys = [scaled(y, YORIGIN) for _, y in coords]
    out = varuint(8) + varuint(len(coords))
    out += varuint(min(xs)) + varuint(min(ys))
    out += varuint(max(xs) - min(xs)) + varuint(max(ys) - min(ys))
    px = py = 0
    for i in range(len(coords)):
        out += varint(xs[i] - px) + varint(ys[i] - py)
        px, py = xs[i], ys[i]
    return out


def pack_value(ftype, v):
    if ftype == 0:
        return struct.pack("<h", v)
    if ftype == 1:
        return struct.pack("<i", v)
    if ftype == 2:
        return struct.pack("<f", v)
    if ftype == 3:
        return struct.pack("<d", v)
    if ftype == 5:
        return struct.pack("<d", v)  # days since 1899-12-30
    if ftype == 4:
        b = v.encode("utf-8")
        return varuint(len(b)) + b
    if ftype == 7:
        return varuint(len(v)) + v
    raise ValueError(ftype)


def write_table(path_base, geom_type_byte, fields, rows):
    """fields: [(name, ftype, nullable)] including the OID field.
    rows: list of dicts name->python value (geometry pre-packed bytes,
    None = NULL). Returns nothing; writes .gdbtable + .gdbtablx."""
    fdesc = b"".join(
        geom_field_desc(n, WKT, nullable) if t == 7 else field_desc(n, t, nullable)
        for (n, t, nullable) in fields)
    section = struct.pack("<i", 4) + bytes([geom_type_byte, 0, 0, 0])
    section += struct.pack("<H", len(fields)) + fdesc
    nullable_fields = [(n, t) for (n, t, nullable) in fields if nullable and t != 6]
    blobs = []
    for row in rows:
        bitmap = bytearray((len(nullable_fields) + 7) // 8)
        for j, (n, _) in enumerate(nullable_fields):
            if row.get(n) is None:
                bitmap[j // 8] |= 1 << (j % 8)
        body = bytes(bitmap)
        for (n, t, nullable) in fields:
            if t == 6:
                continue
            v = row.get(n)
            if v is None:
                assert nullable, f"NULL in non-nullable {n}"
                continue
            body += pack_value(t, v)
        blobs.append(body)
    header = struct.pack("<i", 3) + struct.pack("<i", len(rows))
    header += struct.pack("<i", max((len(b) for b in blobs), default=0))
    header += struct.pack("<i", 5) + struct.pack("<i", 0) + struct.pack("<i", 0)
    field_off = 40
    data = struct.pack("<i", len(section)) + section
    offsets = []
    pos = field_off + 4 + len(section)
    for b in blobs:
        offsets.append(pos)
        data += struct.pack("<i", len(b)) + b
        pos += 4 + len(b)
    file_size = 40 + len(data)
    header += struct.pack("<q", file_size) + struct.pack("<q", field_off)
    with open(path_base + ".gdbtable", "wb") as f:
        f.write(header + data)
    nblocks = (len(rows) + 1023) // 1024
    with open(path_base + ".gdbtablx", "wb") as f:
        f.write(struct.pack("<i", 3) + struct.pack("<i", nblocks))
        f.write(struct.pack("<i", len(rows)) + struct.pack("<i", 5))
        for i in range(nblocks * 1024):
            off = offsets[i] if i < len(offsets) else 0
            f.write(struct.pack("<q", off)[:5])
        f.write(b"\x00" * 16)


WKT = ('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
       'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
       'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]')

# ---- layers ---------------------------------------------------------------

POINTS = [
    # (oid, name, pop, score, born_days, (x, y) or None)
    (1, "alpha", 100, 1.5, 45000.0, (2.5, 3.25)),
    (2, "béta üml", 200, -2.75, 45100.5, (-10.125, 20.0625)),
    (3, None, None, 3.125, None, (100.0, -45.5)),
    (4, "delta", 400, None, 45300.25, None),
    (5, "epsilon", 500, 5.0625, 45400.0, (179.9, 89.9)),
]

ROADS = [
    # (oid, name, lanes, parts)
    (1, "main", 2, [[(0.0, 0.0), (10.5, 0.25), (20.0, -5.125)]]),
    (2, "fork", 4, [[(1.0, 1.0), (2.0, 2.0)], [(3.0, 3.0), (4.0, 2.5), (5.0, 4.0)]]),
]

# Esri ring order: shells clockwise, holes counter-clockwise.
PARCELS = [
    (1, "plain", [[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]]),
    (2, "holed", [[(20.0, 20.0), (20.0, 40.0), (40.0, 40.0), (40.0, 20.0), (20.0, 20.0)],
                  [(25.0, 25.0), (30.0, 25.0), (30.0, 30.0), (25.0, 30.0), (25.0, 25.0)]]),
]

SPOTS = [
    (1, "pair", [(1.5, 2.5), (3.5, 4.5)]),
]


def build():
    if os.path.isdir(DIR):
        shutil.rmtree(DIR)
    os.makedirs(DIR)

    # GDB_SystemCatalog: ID (oid), Name, FileFormat. User tables at
    # ids 9+ -> a00000009... files; GDB_* names are system entries.
    system = ["GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs",
              "GDB_Items", "GDB_ItemTypes", "GDB_ItemRelationships",
              "GDB_ItemRelationshipTypes", "GDB_ReplicaLog"]
    users = ["points", "roads", "parcels", "spots"]
    cat_rows = [{"Name": n, "FileFormat": 0} for n in system + users]
    write_table(os.path.join(DIR, "a00000001"), 0,
                [("ID", 6, False), ("Name", 4, True), ("FileFormat", 1, True)],
                cat_rows)

    write_table(os.path.join(DIR, "a00000009"), 1,
                [("OBJECTID", 6, False), ("name", 4, True), ("pop", 1, True),
                 ("score", 3, True), ("born", 5, True), ("SHAPE", 7, True)],
                [{"name": nm, "pop": pop, "score": sc, "born": bd,
                  "SHAPE": pack_point(*xy) if xy else None}
                 for (_, nm, pop, sc, bd, xy) in POINTS])

    write_table(os.path.join(DIR, "a0000000a"), 3,
                [("OBJECTID", 6, False), ("name", 4, True), ("lanes", 0, True),
                 ("SHAPE", 7, True)],
                [{"name": nm, "lanes": ln, "SHAPE": pack_multipart(3, parts)}
                 for (_, nm, ln, parts) in ROADS])

    write_table(os.path.join(DIR, "a0000000b"), 4,
                [("OBJECTID", 6, False), ("name", 4, True), ("SHAPE", 7, True)],
                [{"name": nm, "SHAPE": pack_multipart(5, rings)}
                 for (_, nm, rings) in PARCELS])

    write_table(os.path.join(DIR, "a0000000c"), 2,
                [("OBJECTID", 6, False), ("name", 4, True), ("SHAPE", 7, True)],
                [{"name": nm, "SHAPE": pack_multipoint(cs)}
                 for (_, nm, cs) in SPOTS])


def golden():
    rows = []
    # coordinates as the scaled-integer encoding reconstructs them
    qx = lambda v: scaled(v, XORIGIN) / XYSCALE + XORIGIN
    qy = lambda v: scaled(v, YORIGIN) / XYSCALE + YORIGIN
    for (oid, nm, pop, sc, bd, xy) in POINTS:
        if xy is None:
            rows.append(("points", oid, nm, "", 0, "", "", "", ""))
        else:
            x, y = qx(xy[0]), qy(xy[1])
            rows.append(("points", oid, nm, "POINT", 1, x, y, x, y))
    for (oid, nm, ln, parts) in ROADS:
        pts = [p for part in parts for p in part]
        gt = "LINESTRING" if len(parts) == 1 else "MULTILINESTRING"
        rows.append(("roads", oid, nm, gt, len(pts),
                     min(qx(x) for x, _ in pts), min(qy(y) for _, y in pts),
                     max(qx(x) for x, _ in pts), max(qy(y) for _, y in pts)))
    for (oid, nm, rings) in PARCELS:
        pts = [p for r in rings for p in r]
        rows.append(("parcels", oid, nm, "POLYGON", len(pts),
                     min(qx(x) for x, _ in pts), min(qy(y) for _, y in pts),
                     max(qx(x) for x, _ in pts), max(qy(y) for _, y in pts)))
    for (oid, nm, cs) in SPOTS:
        rows.append(("spots", oid, nm, "MULTIPOINT", len(cs),
                     min(qx(x) for x, _ in cs), min(qy(y) for _, y in cs),
                     max(qx(x) for x, _ in cs), max(qy(y) for _, y in cs)))
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["layer", "oid", "name", "gtype", "npts", "x0", "y0", "x1", "y1"])
        for r in rows:
            w.writerow(r)


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    build()
    golden()
    print("wrote", DIR, "and", OUT)
