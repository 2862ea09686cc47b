#!/usr/bin/env python3
"""Generate WebP-lossless test fixtures with the SYSTEM libwebp
(independent reference implementation), via ctypes.

For each fixture: <name>_<W>x<H>.webp (real libwebp lossless stream)
and <name>_<W>x<H>.rgba (the exact RGBA input). Lossless means a
correct decoder MUST reproduce the .rgba bytes bit-exactly.

Deterministic: no RNG seeds from time; every pixel is a closed-form
function of (x, y).
"""
import ctypes, os, sys

lw = ctypes.CDLL("libwebp.so.7")
lw.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lw.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lw.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "webp")

def px(fn, w, h):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            r, g, b, a = fn(x, y)
            o = (y * w + x) * 4
            buf[o], buf[o+1], buf[o+2], buf[o+3] = r & 255, g & 255, b & 255, a & 255
    return bytes(buf)

def emit(name, w, h, fn):
    rgba = px(fn, w, h)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, name
    enc = bytes(out[i] for i in range(n))
    # sanity: libwebp itself round-trips losslessly
    dw, dh = ctypes.c_int(), ctypes.c_int()
    dec = lw.WebPDecodeRGBA(enc, n, ctypes.byref(dw), ctypes.byref(dh))
    back = bytes(dec[i] for i in range(dw.value * dh.value * 4))
    assert (dw.value, dh.value) == (w, h) and back == rgba, f"{name}: libwebp not lossless?!"
    base = f"{name}_{w}x{h}"
    open(os.path.join(OUT, base + ".webp"), "wb").write(enc)
    open(os.path.join(OUT, base + ".rgba"), "wb").write(rgba)
    print(f"{base}: {len(rgba)} rgba -> {n} webp")

os.makedirs(OUT, exist_ok=True)

# flat color (trivial palette / LZ77)
emit("flat", 16, 16, lambda x, y: (120, 200, 40, 255))
# 2-color checkerboard (palette, 1-bit bundling)
emit("pal2", 24, 17, lambda x, y: (255, 0, 0, 255) if (x + y) % 2 else (0, 0, 255, 255))
# 4-color stripes (2-bit bundling)
emit("pal4", 33, 9, lambda x, y: [(10,20,30,255),(200,10,10,255),(10,200,10,255),(240,240,0,128)][x % 4])
# 13-color mosaic (4-bit bundling)
emit("pal13", 40, 31, lambda x, y: ((x*x+y) % 13 * 19, (x + y*y) % 13 * 17, (x*y) % 13 * 11, 255))
# 200-color (palette without bundling)
emit("pal200", 50, 26, lambda x, y: ((x + 2*y) % 200, ((x + 2*y) % 200 * 3) % 256, ((x + 2*y) % 200 * 7) % 256, 255))
# smooth gradients (predictor transform)
emit("grad", 64, 48, lambda x, y: (x*3 % 256, y*4 % 256, (x+y)*2 % 256, 255))
# diagonal gradient with alpha ramp
emit("alpha", 37, 23, lambda x, y: ((x*5) % 256, (y*7) % 256, (x*y) % 256, (x*4 + y*2) % 256))
# cross-channel-correlated content (color transform)
emit("ccorr", 48, 40, lambda x, y: ((x*2+y) % 256, (x*2+y+40) % 256, (x*2+y+90) % 256, 255))
# repeating tile pattern (LZ77 backward refs + color cache)
emit("tiles", 72, 54, lambda x, y: ((x % 9)*28, (y % 6)*42, ((x % 9)+(y % 6))*17, 255))
# pseudo-noise (dense huffman codes, many literals)
emit("noise", 45, 35, lambda x, y: ((x*7919 + y*104729) % 256, (x*1299709 + y*15485863) % 256,
                                    (x*32452843 + y*49979687) % 256, 255))
# photo-like blend
emit("photo", 160, 120, lambda x, y: ((x*x//64 + y) % 256, (x + y*y//48) % 256,
                                      ((x*y)//32) % 256, 255))
# degenerate dims
emit("one", 1, 1, lambda x, y: (7, 77, 177, 200))
emit("col", 1, 29, lambda x, y: (y*9 % 256, 255 - y*8 % 256, y*y % 256, 255))
emit("row", 61, 1, lambda x, y: (x*4 % 256, x*5 % 256, x*6 % 256, 255))
print("OK")
