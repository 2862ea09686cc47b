#!/usr/bin/env python3
"""Decode each VP8 fixture with bypass_filtering=1 (loop filter off)
to produce <base>.nflt.yuv ground truth for bisecting decoder bugs."""
import ctypes, os, struct, glob

lw = ctypes.CDLL("libwebp.so.7")

# WebPDecoderConfig layout (little-endian x86-64):
#   WebPBitstreamFeatures: 10 ints = 40 bytes
#   WebPDecBuffer: colorspace,width,height,is_external (16) +
#                  union YUVA (4 ptr + 4 int + pad + 4 size_t = 80) +
#                  pad[4] (16) + private_memory ptr (8) = 120
#   WebPDecoderOptions: 19 ints = 76 -> padded to 80
class Cfg(ctypes.Structure):
    _fields_ = [("feat", ctypes.c_int * 10),
                ("colorspace", ctypes.c_int),
                ("width", ctypes.c_int),
                ("height", ctypes.c_int),
                ("is_external", ctypes.c_int),
                ("y", ctypes.POINTER(ctypes.c_uint8)),
                ("u", ctypes.POINTER(ctypes.c_uint8)),
                ("v", ctypes.POINTER(ctypes.c_uint8)),
                ("a", ctypes.POINTER(ctypes.c_uint8)),
                ("y_stride", ctypes.c_int),
                ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int),
                ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t),
                ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t),
                ("a_size", ctypes.c_size_t),
                ("buf_pad", ctypes.c_int * 4),
                ("private_memory", ctypes.c_void_p),
                ("opt", ctypes.c_int * 19),
                ("tail_pad", ctypes.c_int * 16)]

lw.WebPInitDecoderConfigInternal.restype = ctypes.c_int
lw.WebPDecode.restype = ctypes.c_int
lw.WebPFreeDecBuffer.argtypes = [ctypes.c_void_p]

def init_cfg():
    for abi in (0x0209, 0x0208, 0x020A, 0x0207, 0x0206, 0x0205):
        cfg = Cfg()
        if lw.WebPInitDecoderConfigInternal(ctypes.byref(cfg), abi) == 1:
            return cfg, abi
    raise SystemExit("no ABI version accepted")

cfg, abi = init_cfg()
print("ABI ok:", hex(abi))

DIR = None  # (unused)
SRC = "/root/repo/src/test/resources/vp8"

for f in sorted(glob.glob(SRC + "/*.webp")):
    base = os.path.basename(f)[:-5]
    data = open(f, "rb").read()
    cfg, _ = init_cfg()
    cfg.colorspace = 11  # MODE_YUV
    cfg.opt[0] = 1       # bypass_filtering
    rc = lw.WebPDecode(data, len(data), ctypes.byref(cfg))
    assert rc == 0, (base, rc)
    w, h = cfg.width, cfg.height
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = b"".join(bytes(cfg.y[r*cfg.y_stride : r*cfg.y_stride + w]) for r in range(h))
    u = b"".join(bytes(cfg.u[r*cfg.u_stride : r*cfg.u_stride + cw]) for r in range(ch))
    v = b"".join(bytes(cfg.v[r*cfg.v_stride : r*cfg.v_stride + cw]) for r in range(ch))
    open(SRC + "/" + base + ".nflt.yuv", "wb").write(struct.pack("<II", w, h) + y + u + v)
    lw.WebPFreeDecBuffer(ctypes.byref(cfg, 40))
    print(base, w, h, "ok")
