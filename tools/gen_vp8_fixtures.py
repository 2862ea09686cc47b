#!/usr/bin/env python3
"""Generate lossy (VP8) WebP test fixtures with the SYSTEM libwebp
(independent reference implementation), via ctypes.

For each fixture: <name>_<W>x<H>_q<Q>.webp (real libwebp lossy VP8
stream) and a sibling .yuv file holding libwebp's own decode of that
stream via WebPDecodeYUV — the NORMATIVE output: VP8 reconstruction
(boolean decoder, dequant, IDCT/WHT, intra prediction, loop filter)
is exactly specified integer math, so a conformant decoder MUST
reproduce these planes bit-exactly. (RGB conversion, by contrast, is
non-normative — libwebp's fancy chroma upsampler is its own choice —
which is why the gate is at the YUV level.)

.yuv layout: 8-byte header (w, h as <II), then the cropped Y plane
(w*h bytes row-major), then U and V planes (ceil(w/2)*ceil(h/2) each).

Deterministic: every pixel is a closed-form function of (x, y).
"""
import ctypes, os, struct

lw = ctypes.CDLL("libwebp.so.7")
lw.WebPEncodeRGBA.restype = ctypes.c_size_t
lw.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lw.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "vp8")

def px(fn, w, h):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            r, g, b = fn(x, y)
            o = (y * w + x) * 4
            buf[o], buf[o+1], buf[o+2], buf[o+3] = r & 255, g & 255, b & 255, 255
    return bytes(buf)

def emit(name, w, h, q, fn):
    rgba = px(fn, w, h)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeRGBA(rgba, w, h, w * 4, float(q), ctypes.byref(out))
    assert n > 0, name
    enc = bytes(out[i] for i in range(n))
    dw, dh = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    ystr, uvstr = ctypes.c_int(), ctypes.c_int()
    yp = lw.WebPDecodeYUV(enc, n, ctypes.byref(dw), ctypes.byref(dh),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(ystr), ctypes.byref(uvstr))
    assert (dw.value, dh.value) == (w, h), name
    cw, ch = (w + 1) // 2, (h + 1) // 2
    ybuf = b"".join(bytes(yp[r*ystr.value : r*ystr.value + w]) for r in range(h))
    ubuf = b"".join(bytes(up[r*uvstr.value : r*uvstr.value + cw]) for r in range(ch))
    vbuf = b"".join(bytes(vp[r*uvstr.value : r*uvstr.value + cw]) for r in range(ch))
    base = f"{name}_{w}x{h}_q{q}"
    open(os.path.join(OUT, base + ".webp"), "wb").write(enc)
    open(os.path.join(OUT, base + ".yuv"), "wb").write(
        struct.pack("<II", w, h) + ybuf + ubuf + vbuf)
    print(f"{base}: {n} webp bytes")

def flat(c):
    return lambda x, y: c

def grad(x, y):
    return (x * 5 % 256, y * 7 % 256, (x + y) * 3 % 256)

def noise(x, y):
    # deterministic hash noise — stresses per-MB segmentation + high AC
    h = (x * 2654435761 + y * 97 + 13) & 0xFFFFFFFF
    return (h & 255, (h >> 8) & 255, (h >> 16) & 255)

def checker(x, y):
    on = ((x >> 2) + (y >> 2)) & 1
    return (255, 255, 255) if on else (0, 0, 0)

def edges(x, y):
    v = 230 if (x % 17 == 0 or y % 13 == 0) else 30
    return (v, (v + x) % 256, (v + y) % 256)

def photo(x, y):
    import math
    r = int(128 + 100 * math.sin(x * 0.07) * math.cos(y * 0.05))
    g = int(128 + 90 * math.sin((x + y) * 0.04))
    b = int(128 + 70 * math.cos(x * 0.03 - y * 0.06))
    return (r, g, b)

os.makedirs(OUT, exist_ok=True)
emit("flat", 16, 16, 75, flat((90, 140, 200)))
emit("flat", 32, 32, 20, flat((17, 250, 3)))
emit("grad", 16, 16, 75, grad)
emit("grad", 64, 48, 50, grad)
emit("grad", 17, 13, 75, grad)     # odd dims: crop path
emit("grad", 33, 33, 95, grad)
emit("noise", 48, 48, 75, noise)
emit("noise", 64, 64, 10, noise)
emit("checker", 32, 32, 90, checker)
emit("checker", 63, 31, 50, checker)
emit("edges", 80, 64, 75, edges)
emit("photo", 96, 80, 75, photo)
emit("photo", 96, 80, 30, photo)
emit("photo", 41, 29, 60, photo)

# ---- alpha fixtures: VP8X + ALPH + VP8 (lossy with alpha) ----
# ground truth: libwebp's own RGBA decode gives the exact alpha plane
# (alpha coding is lossless at decode time regardless of encoder
# preprocessing), saved as <base>.alpha: 8-byte header + w*h bytes.
lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lw.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def apx(fn, afn, w, h):
    buf = bytearray(px(fn, w, h))
    for y in range(h):
        for x in range(w):
            buf[(y * w + x) * 4 + 3] = afn(x, y) & 255
    return bytes(buf)

def emit_alpha(name, w, h, q, fn, afn):
    rgba = apx(fn, afn, w, h)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeRGBA(rgba, w, h, w * 4, float(q), ctypes.byref(out))
    assert n > 0, name
    enc = bytes(out[i] for i in range(n))
    assert b"ALPH" in enc[:64], f"{name}: encoder produced no ALPH chunk"
    dw, dh = ctypes.c_int(), ctypes.c_int()
    dp = lw.WebPDecodeRGBA(enc, n, ctypes.byref(dw), ctypes.byref(dh))
    assert (dw.value, dh.value) == (w, h)
    alpha = bytes(dp[i * 4 + 3] for i in range(w * h))
    # color ground truth too (YUV), same as the opaque fixtures
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    ystr, uvstr = ctypes.c_int(), ctypes.c_int()
    yp = lw.WebPDecodeYUV(enc, n, ctypes.byref(dw), ctypes.byref(dh),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(ystr), ctypes.byref(uvstr))
    cw, ch = (w + 1) // 2, (h + 1) // 2
    ybuf = b"".join(bytes(yp[r*ystr.value : r*ystr.value + w]) for r in range(h))
    ubuf = b"".join(bytes(up[r*uvstr.value : r*uvstr.value + cw]) for r in range(ch))
    vbuf = b"".join(bytes(vp[r*uvstr.value : r*uvstr.value + cw]) for r in range(ch))
    base = f"{name}_{w}x{h}_q{q}"
    open(os.path.join(OUT, base + ".webp"), "wb").write(enc)
    open(os.path.join(OUT, base + ".yuv"), "wb").write(
        struct.pack("<II", w, h) + ybuf + ubuf + vbuf)
    open(os.path.join(OUT, base + ".alpha"), "wb").write(
        struct.pack("<II", w, h) + alpha)
    print(f"{base}: {n} webp bytes (alpha)")

emit_alpha("agrad", 32, 32, 75, grad, lambda x, y: max(0, 255 - y * 8))
emit_alpha("agrad", 48, 40, 50, photo, lambda x, y: (x * 8) % 256)
emit_alpha("anoise", 32, 32, 75, grad,
           lambda x, y: ((x * 2654435761 + y * 97) >> 3) & 255)
emit_alpha("aedge", 33, 17, 90, grad,
           lambda x, y: 255 if (x + y) % 5 else 0)
emit_alpha("aflat", 16, 16, 75, grad, lambda x, y: 128)
