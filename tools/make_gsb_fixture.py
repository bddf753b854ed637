#!/usr/bin/env python3
"""Synthetic NTv2 grid-shift fixture + golden for q_geo_gridshift.

Writes a two-subgrid NTv2 `.gsb` file in the published NRCan binary
layout (11 16-byte overview records, 11 per-subgrid records, float32
nodes, longitude positive west, longitude-fastest node order), plus a
big-endian twin for the endianness-detection spec, then computes the
expected NAD27<->NAD83 transforms for planted points with INDEPENDENT
python accounting (its own parse of the file it just wrote + the
documented bilinear / 4-round-inverse contract, replicating the Scala
operation order bit-for-bit so the doubles repr-match).

Outputs:
  src/test/resources/ntv2/synthetic.gsb          (little-endian)
  src/test/resources/ntv2_be/synthetic_be.gsb    (big-endian twin)
  src/test/resources/golden/gridshift_golden.csv (id,dir,lon_in,lat_in,lon_out,lat_out)
"""
import os, struct

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rec_str(name, val, bo):
    assert len(name) == 8, name
    return name.encode("ascii") + val.ljust(8)[:8].encode("ascii")


def rec_int(name, val, bo):
    return name.encode("ascii") + struct.pack(bo + "i", val) + b"\x00" * 4


def rec_dbl(name, val, bo):
    return name.encode("ascii") + struct.pack(bo + "d", val)


# subgrid definitions: header values in arc-seconds, lon positive west
BASE = dict(name="SYNTH0  ", parent="NONE    ",
            s_lat=144000.0, n_lat=162000.0,     # 40N .. 45N
            e_lon=252000.0, w_lon=288000.0,     # 70W .. 80W
            lat_inc=900.0, lon_inc=900.0)
FINE = dict(name="SYNTH1  ", parent="SYNTH0  ",
            s_lat=151200.0, n_lat=154800.0,     # 42N .. 43N
            e_lon=259200.0, w_lon=266400.0,     # 72W .. 74W
            lat_inc=450.0, lon_inc=450.0)


def nodes(sg):
    nrows = round((sg["n_lat"] - sg["s_lat"]) / sg["lat_inc"]) + 1
    ncols = round((sg["w_lon"] - sg["e_lon"]) / sg["lon_inc"]) + 1
    lat_shift, lon_shift = [], []
    fine = sg["name"].strip() == "SYNTH1"
    for r in range(nrows):
        for c in range(ncols):
            if fine:
                # deliberately different from the base surface so a
                # point in the fine grid certifies subgrid selection
                lat_shift.append(0.9 + 0.004 * r + 0.0015 * c)
                lon_shift.append(1.6 + 0.002 * r - 0.0011 * c)
            else:
                lat_shift.append(0.5 + 0.01 * r + 0.003 * c)
                lon_shift.append(1.2 + 0.005 * r - 0.002 * c)
    return nrows, ncols, lat_shift, lon_shift


def write_gsb(path, bo):
    out = bytearray()
    out += rec_int("NUM_OREC", 11, bo)
    out += rec_int("NUM_SREC", 11, bo)
    out += rec_int("NUM_FILE", 2, bo)
    out += rec_str("GS_TYPE ", "SECONDS ", bo)
    out += rec_str("VERSION ", "NTv2.0  ", bo)
    out += rec_str("SYSTEM_F", "NAD27   ", bo)
    out += rec_str("SYSTEM_T", "NAD83   ", bo)
    out += rec_dbl("MAJOR_F ", 6378206.4, bo)
    out += rec_dbl("MINOR_F ", 6356583.8, bo)
    out += rec_dbl("MAJOR_T ", 6378137.0, bo)
    out += rec_dbl("MINOR_T ", 6356752.314, bo)
    for sg in (BASE, FINE):
        nrows, ncols, lat_s, lon_s = nodes(sg)
        out += rec_str("SUB_NAME", sg["name"], bo)
        out += rec_str("PARENT  ", sg["parent"], bo)
        out += rec_str("CREATED ", "20260815", bo)
        out += rec_str("UPDATED ", "20260815", bo)
        out += rec_dbl("S_LAT   ", sg["s_lat"], bo)
        out += rec_dbl("N_LAT   ", sg["n_lat"], bo)
        out += rec_dbl("E_LONG  ", sg["e_lon"], bo)
        out += rec_dbl("W_LONG  ", sg["w_lon"], bo)
        out += rec_dbl("LAT_INC ", sg["lat_inc"], bo)
        out += rec_dbl("LONG_INC", sg["lon_inc"], bo)
        out += rec_int("GS_COUNT", nrows * ncols, bo)
        for ls, lo in zip(lat_s, lon_s):
            out += struct.pack(bo + "ffff", ls, lo, 0.05, 0.05)
    with open(path, "wb") as f:
        f.write(out)


# ---- independent accounting: re-parse + apply -------------------------


class Sub:
    def __init__(self, name, s_lat, n_lat, e_lon, w_lon, lat_inc, lon_inc,
                 lat_shift, lon_shift):
        self.name = name
        self.s_lat, self.n_lat = s_lat, n_lat
        self.e_lon, self.w_lon = e_lon, w_lon
        self.lat_inc, self.lon_inc = lat_inc, lon_inc
        self.nrows = round((n_lat - s_lat) / lat_inc) + 1
        self.ncols = round((w_lon - e_lon) / lon_inc) + 1
        self.lat_shift, self.lon_shift = lat_shift, lon_shift

    def contains(self, lat_sec, lonw_sec):
        return (self.s_lat <= lat_sec <= self.n_lat and
                self.e_lon <= lonw_sec <= self.w_lon)

    def interp(self, lat_sec, lonw_sec):
        row = int((lat_sec - self.s_lat) / self.lat_inc)
        col = int((lonw_sec - self.e_lon) / self.lon_inc)
        if row > self.nrows - 2:
            row = self.nrows - 2
        if col > self.ncols - 2:
            col = self.ncols - 2
        fy = (lat_sec - self.s_lat) / self.lat_inc - row
        fx = (lonw_sec - self.e_lon) / self.lon_inc - col

        def bil(arr):
            a = arr[row * self.ncols + col]
            b = arr[row * self.ncols + col + 1]
            c = arr[(row + 1) * self.ncols + col]
            d = arr[(row + 1) * self.ncols + col + 1]
            return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy) +
                    c * (1 - fx) * fy + d * fx * fy)

        return bil(self.lat_shift), bil(self.lon_shift)


def parse_gsb(path):
    data = open(path, "rb").read()
    bo = "<" if struct.unpack_from("<i", data, 8)[0] == 11 else ">"
    pos = 0

    def rec():
        nonlocal pos
        name = data[pos:pos + 8].decode("ascii").strip()
        raw = data[pos + 8:pos + 16]
        pos += 16
        return name, raw

    hdr = {}
    for _ in range(11):
        n, raw = rec()
        hdr[n] = raw
    num_file = struct.unpack(bo + "i", hdr["NUM_FILE"][:4])[0]
    subs = []
    for _ in range(num_file):
        sh = {}
        for _ in range(11):
            n, raw = rec()
            sh[n] = raw
        count = struct.unpack(bo + "i", sh["GS_COUNT"][:4])[0]
        dbl = lambda k: struct.unpack(bo + "d", sh[k])[0]
        lat_s, lon_s = [], []
        for i in range(count):
            ls, lo, _, _ = struct.unpack_from(bo + "ffff", data, pos)
            pos += 16
            lat_s.append(ls)   # float32 -> python double, exact
            lon_s.append(lo)
        subs.append(Sub(sh["SUB_NAME"].decode("ascii").strip(),
                        dbl("S_LAT"), dbl("N_LAT"), dbl("E_LONG"), dbl("W_LONG"),
                        dbl("LAT_INC"), dbl("LONG_INC"), lat_s, lon_s))
    return subs


def sub_for(subs, lat_sec, lonw_sec):
    best = None
    for sg in subs:
        if sg.contains(lat_sec, lonw_sec) and (
                best is None or sg.lat_inc < best.lat_inc or
                (sg.lat_inc == best.lat_inc and sg.name < best.name)):
            best = sg
    return best


def fwd(subs, lon_deg, lat_deg):
    lat_sec = lat_deg * 3600.0
    lonw = -lon_deg * 3600.0
    sg = sub_for(subs, lat_sec, lonw)
    assert sg is not None, (lon_deg, lat_deg)
    d_lat, d_lonw = sg.interp(lat_sec, lonw)
    return lon_deg - d_lonw / 3600.0, lat_deg + d_lat / 3600.0


def inv(subs, lon_deg, lat_deg):
    lo, la = lon_deg, lat_deg
    any_hit = False
    i = 0
    while i < 4:
        lat_sec = la * 3600.0
        lonw = -lo * 3600.0
        sg = sub_for(subs, lat_sec, lonw)
        if sg is None:
            break
        any_hit = True
        d_lat, d_lonw = sg.interp(lat_sec, lonw)
        lo = lon_deg + d_lonw / 3600.0
        la = lat_deg - d_lat / 3600.0
        i += 1
    assert any_hit, (lon_deg, lat_deg)
    return lo, la


# forward rows transform NAD27 -> NAD83 (applied shift); reverse rows
# iterate NAD83 -> NAD27. All planted points sit inside the base grid,
# ids 2/5 inside the fine subgrid (certifying densest-subgrid choice).
POINTS = [
    (1, "fwd", -75.1234, 41.2050),
    (2, "fwd", -73.0200, 42.5017),
    (3, "fwd", -71.3301, 44.8990),
    (4, "inv", -75.2002, 40.8003),
    (5, "inv", -73.5005, 42.2501),
]


def main():
    gdir = os.path.join(ROOT, "src/test/resources/ntv2")
    bdir = os.path.join(ROOT, "src/test/resources/ntv2_be")
    odir = os.path.join(ROOT, "src/test/resources/golden")
    for d in (gdir, bdir, odir):
        os.makedirs(d, exist_ok=True)
    le = os.path.join(gdir, "synthetic.gsb")
    be = os.path.join(bdir, "synthetic_be.gsb")
    write_gsb(le, "<")
    write_gsb(be, ">")
    subs = parse_gsb(le)
    rows = ["id,dir,lon_in,lat_in,lon_out,lat_out"]
    for pid, d, lon, lat in POINTS:
        if d == "fwd":
            lo, la = fwd(subs, lon, lat)
        else:
            lo, la = inv(subs, lon, lat)
        rows.append(f"{pid},{d},{lon!r},{lat!r},{lo!r},{la!r}")
        print(rows[-1])
    with open(os.path.join(odir, "gridshift_golden.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
