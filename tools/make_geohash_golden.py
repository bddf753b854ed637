#!/usr/bin/env python3
"""Independent golden for q_geo_geohash: a from-scratch python geohash
(encode + cell decode) over the same closed-form customer lattice the
gate row uses — shares no code with the Scala implementation. All
bisection midpoints are exact binary rationals, so both sides are
bit-identical with no tolerance."""
import csv

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def encode(lon, lat, prec):
    lon_lo, lon_hi, lat_lo, lat_hi = -180.0, 180.0, -90.0, 90.0
    out, ch, bit, is_lon = [], 0, 0, True
    while len(out) < prec:
        if is_lon:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        is_lon = not is_lon
        bit += 1
        if bit == 5:
            out.append(B32[ch])
            bit, ch = 0, 0
    return "".join(out)


def cell(gh):
    lon_lo, lon_hi, lat_lo, lat_hi = -180.0, 180.0, -90.0, 90.0
    is_lon = True
    for c in gh:
        v = B32.index(c)
        for b in range(4, -1, -1):
            on = (v >> b) & 1
            if is_lon:
                mid = (lon_lo + lon_hi) / 2
                if on:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if on:
                    lat_lo = mid
                else:
                    lat_hi = mid
            is_lon = not is_lon
    return lon_lo, lat_lo, lon_hi, lat_hi


rows = []
for c in range(1, 301):  # the q_geo_transform lattice, custkey 1..300
    lon = (c % 360) - 179.5
    lat = ((c * 7) % 160) - 79.5
    gh = encode(lon, lat, 8)
    x0, y0, x1, y1 = cell(gh)
    rows.append({"c_custkey": c, "gh": gh,
                 "cx": repr((x0 + x1) / 2), "cy": repr((y0 + y1) / 2)})

OUT = "src/test/resources/golden/geohash_golden.csv"
with open(OUT, "w", newline="") as fh:
    w = csv.DictWriter(fh, fieldnames=["c_custkey", "gh", "cx", "cy"])
    w.writeheader()
    w.writerows(rows)
print(f"wrote {len(rows)} rows to {OUT}")
# sanity: the canonical test vector
assert encode(-5.6, 42.6, 5) == "ezs42", encode(-5.6, 42.6, 5)
