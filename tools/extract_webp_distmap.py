#!/usr/bin/env python3
"""Provenance for Webp.scala's DistMap: derive the VP8L 120-entry
short-distance neighbor map EMPIRICALLY from the system libwebp.

For each plane code P in 1..120, craft a minimal VP8L stream whose
pixels are unique-colored literals plus ONE length-1 LZ77 copy using
plane code P, decode it with libwebp (ctypes), and read back which
source pixel was copied. dist = pos - src; (dx, dy) = dist decomposed
over the 17-pixel-wide test image. The resulting table is printed in
Scala-literal form and must match Webp.scala's DistMap verbatim.
"""
import ctypes

lw = ctypes.CDLL("libwebp.so.7")
lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lw.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

class Bw:
    def __init__(self): self.bits=[]
    def put(self, v, n):
        for k in range(n): self.bits.append((v>>k)&1)
    def code(self, c, l):
        for k in range(l-1, -1, -1): self.bits.append((c>>k)&1)
    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i+8]): b |= bit<<j
            out.append(b)
        return bytes(out)

CLORDER = [17,18,0,1,2,3,4,5,16,6,7,8,9,10,11,12,13,14,15]

def write_lens(bw, lens, alphabet):
    used = sorted(set([l for l in lens if l] + [0]))
    import math
    L = max(1, math.ceil(math.log2(len(used))))
    clset = {s: L for s in used}
    for k in range((1<<L) - len(used)):
        clset[[s for s in (15,14,13,12,11) if s not in clset][0]] = L
    n = max(4, max(CLORDER.index(s) for s in clset)+1)
    bw.put(0,1); bw.put(n-4,4)
    for k in range(n): bw.put(clset.get(CLORDER[k],0), 3)
    bw.put(0,1)
    codes = {s:(i,L) for i,s in enumerate(sorted(clset))}
    for s in range(alphabet):
        c,l = codes[lens[s] if s < len(lens) else 0]
        bw.code(c,l)

def simple_single(bw, sym):
    bw.put(1,1); bw.put(0,1)
    if sym > 1: bw.put(1,1); bw.put(sym,8)
    else: bw.put(0,1); bw.put(sym,1)

GLENS = [8]*254 + [10]*8 + [0]*(280-262)
def gcode(sym):
    return (sym, 8) if sym < 254 else (1016 + (sym-254), 10)
DLENS = [5]*24 + [6]*16
def dcode(sym):
    return (sym, 5) if sym < 24 else (48 + (sym-24), 6)
def dist_prefix(P):
    if P <= 4: return (P-1, 0, 0)
    for s in range(4, 40):
        extra = (s-2)>>1
        base = (2+(s&1))<<extra
        if base+1 <= P <= base+(1<<extra): return (s, P-base-1, extra)
    raise Exception(P)

W,H = 17,10
POS0 = 9*W+9
table = []
for P in range(1, 121):
    bw = Bw()
    bw.put(0x2F,8); bw.put(W-1,14); bw.put(H-1,14); bw.put(1,1); bw.put(0,3)
    bw.put(0,1); bw.put(0,1); bw.put(0,1)
    write_lens(bw, GLENS, 280)
    write_lens(bw, [8]*256, 256)
    write_lens(bw, [8]*256, 256)
    simple_single(bw, 255)
    write_lens(bw, DLENS, 40)
    for k in range(POS0):
        c,l = gcode(k % 254); bw.code(c,l); bw.code(k//254,8); bw.code(0,8)
    c,l = gcode(256); bw.code(c,l)
    s, ev, eb = dist_prefix(P)
    dc, dl = dcode(s); bw.code(dc,dl)
    if eb: bw.put(ev, eb)
    for k in range(POS0+1, W*H):
        c,l = gcode(k % 254); bw.code(c,l); bw.code(k//254,8); bw.code(0,8)
    payload = bw.bytes()
    riff = b'RIFF' + (4+8+len(payload)+(len(payload)&1)).to_bytes(4,'little') + b'WEBP' \
         + b'VP8L' + len(payload).to_bytes(4,'little') + payload + (b'\0' if len(payload)&1 else b'')
    dw, dh = ctypes.c_int(), ctypes.c_int()
    dec = lw.WebPDecodeRGBA(riff, len(riff), ctypes.byref(dw), ctypes.byref(dh))
    assert dec, f"plane {P} refused"
    px = bytes(dec[i] for i in range(W*H*4))
    src = px[4*POS0]*254 + px[4*POS0+1]
    dist = POS0 - src
    dy, dx = divmod(dist + 8, W)
    table.append((dx-8, dy))
for row in range(0, 120, 8):
    print("    " + ", ".join(f"({dx}, {dy})" for dx,dy in table[row:row+8]) + ",")
