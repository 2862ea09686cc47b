#!/usr/bin/env python3
"""Provenance for Vp8Tables.scala: extract the four large VP8 keyframe
probability/dequant tables from the SYSTEM libwebp shared object
(an independent reference implementation of RFC 6386).

The tables are located STRUCTURALLY, not by hard-coded offsets:

  1. kAcTable  (uint16[128]) — the unique non-decreasing 128-entry
     uint16 run starting 4,5,6,7 and ending 284 (RFC 6386 14.1 AC
     dequant lookup).
  2. kDcTable  (uint8[128])  — immediately follows kAcTable in
     dec/quant_dec.c's rodata: non-decreasing 4..157.
  3. kBands    (uint8[16])   — follows kDcTable: the coefficient-
     position -> band map {0,1,2,3,6,4,5,6,...,7} (RFC 13.3).
  4. CoeffsUpdateProba [4][8][3][11] — the mostly-255 block that ends
     exactly at kBModesProba (RFC 13.4 update probabilities).
  5. kBModesProba [10][10][9] — anchored by its first row
     {231,120,48,89,115,113,120,152,112} (RFC 11.5 keyframe subblock
     mode probabilities; that row is quoted in the RFC text).
  6. CoeffsProba0 [4][8][3][11] — follows kBModesProba (after
     padding): starts with 33 bytes of 128 (block-type-0 band 0 is
     never read: Y-after-Y2 blocks start at coefficient 1) and then
     the RFC 13.5 defaults (253,136,254,...).

Every extracted byte is then VERIFIED end-to-end: Vp8Spec decodes
real libwebp-encoded lossy streams and requires bit-exact equality
with libwebp's own normative YUV output (WebPDecodeYUV) — any wrong
table byte desynchronizes the boolean decoder within a few
macroblocks, so fixture equality covers the tables exhaustively.

Output: the tables in Scala-literal form (must match Vp8Tables.scala
verbatim).
"""
import ctypes.util
import struct
import sys

path = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
data = open(path, "rb").read()

# --- 1. kAcTable: unique monotone uint16[128] run 4..284 ---
u16 = struct.unpack_from("<%dH" % (len(data) // 2), data)
ac_offs = []
for off in range(len(u16) - 128):
    if u16[off] == 4 and u16[off + 1] == 5 and u16[off + 2] == 6:
        seq = u16[off:off + 128]
        if all(seq[k] <= seq[k + 1] for k in range(127)) and seq[-1] == 284:
            ac_offs.append(off * 2)
# the decoder's copy is followed by kDcTable (uint8, starts 4,5,6,7)
ac_off = next(o for o in ac_offs
              if data[o + 256:o + 260] == bytes([4, 5, 6, 7]))
ac = list(struct.unpack_from("<128H", data, ac_off))

# --- 2. kDcTable: uint8[128] right after ---
dc_off = ac_off + 256
dc = list(data[dc_off:dc_off + 128])
assert dc[0] == 4 and dc[-1] == 157 and \
    all(dc[k] <= dc[k + 1] for k in range(127)), dc

# --- 3. kBands ---
bands_off = dc_off + 128
bands = list(data[bands_off:bands_off + 16])
assert bands == [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7], bands

# --- 5. kBModesProba anchored by its RFC-quoted first row ---
bm_off = data.find(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
assert bm_off > 0
bmodes = list(data[bm_off:bm_off + 900])

# --- 4. CoeffsUpdateProba: the 1056 bytes ending at kBModesProba ---
upd_off = bm_off - 1056
upd = list(data[upd_off:upd_off + 1056])
assert upd.count(255) > 800, "update-prob table should be mostly 255"

# --- 6. CoeffsProba0: after kBModesProba + alignment padding,
#        starts with 33 x 128 then 253,136,254 ---
tail = data[bm_off + 900: bm_off + 900 + 64]
pad = next(i for i in range(64)
           if data[bm_off + 900 + i: bm_off + 900 + i + 36] ==
           bytes([128] * 33 + [253, 136, 254]))
cp_off = bm_off + 900 + pad
coeffs = list(data[cp_off:cp_off + 1056])

def scala(name, vals, per=16):
    print(f"  val {name}: Array[Int] = Array(")
    for i in range(0, len(vals), per):
        row = ", ".join(str(v) for v in vals[i:i + per])
        sep = "," if i + per < len(vals) else ")"
        print(f"    {row}{sep}")

print(f"// extracted from {path}")
print(f"// offsets: ac={ac_off} dc={dc_off} bands={bands_off} "
      f"upd={upd_off} bmodes={bm_off} coeffs={cp_off}")
scala("AcQ", ac)
scala("DcQ", dc)
scala("KfBModeProbs", bmodes)
scala("CoeffUpdateProbs", upd)
scala("CoeffProbs", coeffs)
