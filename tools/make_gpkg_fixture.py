#!/usr/bin/env python3
"""Generates the GeoPackage test fixture at src/test/resources/sample.gpkg.

Deterministic content (spec asserts closed-form aggregates):
  layer `pts`  : 3000 rows, fid=i (1-based), name='name_%d', value=i*0.5,
                 flag=i%2, tag=NULL when i%7==0 else 'tag%d'%(i%3),
                 geom=POINT(i%100, i//100); plus fid=3001 with a 20000-char
                 name (overflow page) and NULL geometry.
  layer `lines`: 10 rows, fid=i, kind='k%d'%(i%2), geom=LINESTRING(i 0, i+1 1).
Run once; the .gpkg binary is committed as a test resource.
"""
import os, sqlite3, struct

out = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "sample.gpkg")
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

def wkb_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)

def wkb_linestring(pts):
    return struct.pack("<BII", 1, 2, len(pts)) + b"".join(struct.pack("<dd", x, y) for x, y in pts)

def gpb(wkb, srs_id=4326):
    # GeoPackage binary header: magic GP, version 0, flags=0x01 (LE, no envelope)
    return struct.pack("<ccBBi", b"G", b"P", 0, 0x01, srs_id) + wkb

con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
cur.execute("PRAGMA user_version = 10300")

cur.execute("""CREATE TABLE gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL,
  organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)""")
cur.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL)")

cur.execute("""CREATE TABLE gpkg_contents (
  table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE,
  description TEXT DEFAULT '', last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
  max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
cur.execute("""CREATE TABLE gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL,
  srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL,
  CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")

cur.execute("""CREATE TABLE pts (
  fid INTEGER PRIMARY KEY AUTOINCREMENT, name TEXT, value REAL, flag INTEGER,
  tag TEXT, geom POINT)""")
cur.execute("""CREATE TABLE lines (
  fid INTEGER PRIMARY KEY AUTOINCREMENT, kind TEXT, geom LINESTRING)""")

for i in range(1, 3001):
    cur.execute("INSERT INTO pts (name, value, flag, tag, geom) VALUES (?,?,?,?,?)",
                ("name_%d" % i, i * 0.5, i % 2,
                 None if i % 7 == 0 else "tag%d" % (i % 3),
                 gpb(wkb_point(float(i % 100), float(i // 100)))))
cur.execute("INSERT INTO pts (name, value, flag, tag, geom) VALUES (?,?,?,?,?)",
            ("x" * 20000, None, None, "big", None))

for i in range(1, 11):
    cur.execute("INSERT INTO lines (kind, geom) VALUES (?,?)",
                ("k%d" % (i % 2), gpb(wkb_linestring([(float(i), 0.0), (float(i + 1), 1.0)]))))

cur.execute("""INSERT INTO gpkg_contents VALUES
  ('pts', 'features', 'pts', '', '2026-01-01T00:00:00Z', 0, 0, 99, 30, 4326)""")
cur.execute("""INSERT INTO gpkg_contents VALUES
  ('lines', 'features', 'lines', '', '2026-01-01T00:00:00Z', 1, 0, 11, 1, 4326)""")
cur.execute("INSERT INTO gpkg_geometry_columns VALUES ('pts', 'geom', 'POINT', 4326, 0, 0)")
cur.execute("INSERT INTO gpkg_geometry_columns VALUES ('lines', 'geom', 'LINESTRING', 4326, 0, 0)")

con.commit()
con.close()
print("wrote", out, os.path.getsize(out), "bytes")
