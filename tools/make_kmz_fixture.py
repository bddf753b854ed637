#!/usr/bin/env python3
"""KMZ fixture for q_src_kmz: zip the committed KML fixture as the
conventional doc.kml root entry, plus decoy entries (an icon blob and a
second .kml overlay) so the reader's doc.kml preference is exercised.
The golden is kml_golden.csv — the independent xml.etree accounting of
the very same document (tools/make_kml_golden.py)."""
import zipfile

SRC = "src/test/resources/kml/sample.kml"
OUT = "src/test/resources/kml/sample.kmz"

overlay = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
    '<Placemark><name>decoy-overlay</name>'
    '<Point><coordinates>0,0</coordinates></Point></Placemark>'
    "</Document></kml>"
)

with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
    z.write(SRC, "doc.kml")
    z.writestr("files/overlay.kml", overlay)
    z.writestr("files/icon.png", b"\x89PNG\r\n\x1a\nnot-a-real-png")
print("wrote", OUT)
