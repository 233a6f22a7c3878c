"""ctypes bindings for the native (C++) components in csrc/.

Two libraries:
  * libfxpref.so  -- golden fixed-point integer kernels (shift requant, int
    conv/gemm, residual add, avgpool); an independent implementation used to
    triangulate bit-exactness of the XLA and Pallas paths.
  * libimageops.so -- threaded image preprocessing (bilinear resize, crop,
    normalize) used by the data Loader's fast path.

`build_native()` compiles on demand with make; all entry points degrade
gracefully (raise RuntimeError naming the missing library) so the pure-JAX
paths keep working without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")

_libs = {}


def build_native(quiet: bool = True) -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC, "all"],
            check=True,
            capture_output=quiet,
        )
        return True
    except Exception:
        return False


def _load(name: str) -> Optional[ctypes.CDLL]:
    if name in _libs:
        return _libs[name]
    path = os.path.join(_CSRC, name)
    if not os.path.exists(path):
        build_native()
    try:
        _libs[name] = ctypes.CDLL(path)
    except OSError:
        _libs[name] = None
    return _libs[name]


def fxpref_available() -> bool:
    return _load("libfxpref.so") is not None


def imageops_available() -> bool:
    return _load("libimageops.so") is not None


_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_c = ctypes.c_int


def _fxp() -> ctypes.CDLL:
    lib = _load("libfxpref.so")
    if lib is None:
        raise RuntimeError("libfxpref.so not built (run make -C csrc)")
    if not getattr(lib, "_sigs_set", False):
        lib.shift_requant_i32.argtypes = [_i32p, _i32p, ctypes.c_int64, _c, _c, _c, _c]
        lib.conv2d_int.argtypes = [_i32p, _i8p, ctypes.c_void_p, _i32p] + [_c] * 11
        lib.residual_add_int.argtypes = [_i32p, _c, _i32p, _c, _i32p, ctypes.c_int64]
        lib.avgpool_sum_int.argtypes = [_i32p, _i32p, _c, _c, _c, _c]
        lib.gemm_int8.argtypes = [_i8p, _i8p, ctypes.c_void_p, _i32p, _c, _c, _c]
        lib._sigs_set = True
    return lib


def c_shift_requant(x: np.ndarray, wl: int, fl: int, input_fl: int, signed: bool) -> np.ndarray:
    lib = _fxp()
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty_like(x)
    lib.shift_requant_i32(
        x.ravel(), out.ravel(), ctypes.c_int64(x.size),
        wl, fl, input_fl, int(signed),
    )
    return out


def c_conv2d_int(
    x: np.ndarray, w: np.ndarray, bias: Optional[np.ndarray],
    stride=(1, 1), padding=(0, 0), groups: int = 1,
) -> np.ndarray:
    """x int32 NHWC, w int8 HWIO -> int32 NHWC."""
    lib = _fxp()
    x = np.ascontiguousarray(x, np.int32)
    w = np.ascontiguousarray(w, np.int8)
    N, H, W, C = x.shape
    kh, kw, _, O = w.shape
    ho = (H + 2 * padding[0] - kh) // stride[0] + 1
    wo = (W + 2 * padding[1] - kw) // stride[1] + 1
    y = np.empty((N, ho, wo, O), np.int32)
    b = np.ascontiguousarray(bias, np.int32) if bias is not None else None
    lib.conv2d_int(
        x.ravel(), w.ravel(),
        b.ctypes.data_as(ctypes.c_void_p) if b is not None else None,
        y.ravel(), N, H, W, C, O, kh, kw,
        stride[0], stride[1], padding[0], padding[1], groups,
    )
    return y


def c_residual_add_int(res: np.ndarray, res_fl: int, x: np.ndarray, x_fl: int) -> np.ndarray:
    lib = _fxp()
    res = np.ascontiguousarray(res, np.int32)
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty_like(res)
    lib.residual_add_int(res.ravel(), res_fl, x.ravel(), x_fl, out.ravel(), ctypes.c_int64(res.size))
    return out


def c_avgpool_sum_int(x: np.ndarray) -> np.ndarray:
    lib = _fxp()
    x = np.ascontiguousarray(x, np.int32)
    N, H, W, C = x.shape
    y = np.empty((N, C), np.int32)
    lib.avgpool_sum_int(x.ravel(), y.ravel(), N, H, W, C)
    return y


def c_gemm_int8(x: np.ndarray, w: np.ndarray, bias: Optional[np.ndarray]) -> np.ndarray:
    lib = _fxp()
    x = np.ascontiguousarray(x, np.int8)
    w = np.ascontiguousarray(w, np.int8)
    M, K = x.shape
    _, N = w.shape
    y = np.empty((M, N), np.int32)
    b = np.ascontiguousarray(bias, np.int32) if bias is not None else None
    lib.gemm_int8(
        x.ravel(), w.ravel(),
        b.ctypes.data_as(ctypes.c_void_p) if b is not None else None,
        y.ravel(), M, K, N,
    )
    return y


def c_train_preprocess_batch(
    images, boxes, flips, size: int,
    mean: Optional[np.ndarray] = None, std: Optional[np.ndarray] = None,
    num_threads: int = 4,
) -> np.ndarray:
    """images: uint8 HWC arrays; boxes: (n,4) int32 (y0,x0,h,w); flips: (n,)
    uint8 -> (n,size,size,3) f32 (crop -> antialiased resize -> flip)."""
    lib = _load("libimageops.so")
    if lib is None:
        raise RuntimeError("libimageops.so not built (run make -C csrc)")
    if not getattr(lib, "_train_sigs", False):
        lib.train_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), _i32p, _i32p, _u8p,
            _c, _c, _c, _f32p, _f32p, _f32p, _c, _c,
        ]
        lib._train_sigs = True
    n = len(images)
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
    )
    dims = np.array([[im.shape[0], im.shape[1]] for im in images], np.int32)
    boxes = np.ascontiguousarray(boxes, np.int32)
    flips = np.ascontiguousarray(flips, np.uint8)
    out = np.empty((n, size, size, 3), np.float32)
    do_norm = int(mean is not None)
    mean = np.ascontiguousarray(mean if mean is not None else np.zeros(3), np.float32)
    std = np.ascontiguousarray(std if std is not None else np.ones(3), np.float32)
    lib.train_preprocess_batch(
        ptrs, dims.ravel(), boxes.ravel(), flips.ravel(), n, 3, size,
        out.ravel(), mean, std, do_norm, num_threads,
    )
    return out


def c_eval_preprocess_batch(
    images, resize: int, size: int,
    mean: Optional[np.ndarray] = None, std: Optional[np.ndarray] = None,
    num_threads: int = 4,
) -> np.ndarray:
    """images: list of uint8 HWC arrays (varied sizes) -> (n,size,size,3) f32."""
    lib = _load("libimageops.so")
    if lib is None:
        raise RuntimeError("libimageops.so not built (run make -C csrc)")
    if not getattr(lib, "_sigs_set", False):
        lib.eval_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), _i32p, _c, _c, _c, _c,
            _f32p, _f32p, _f32p, _c, _c,
        ]
        lib._sigs_set = True
    n = len(images)
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
    )
    dims = np.array([[im.shape[0], im.shape[1]] for im in images], np.int32)
    out = np.empty((n, size, size, 3), np.float32)
    do_norm = int(mean is not None)
    mean = np.ascontiguousarray(mean if mean is not None else np.zeros(3), np.float32)
    std = np.ascontiguousarray(std if std is not None else np.ones(3), np.float32)
    lib.eval_preprocess_batch(
        ptrs, dims.ravel(), n, 3, resize, size, out.ravel(),
        mean, std, do_norm, num_threads,
    )
    return out


def jpeg_available() -> bool:
    lib = _load("libimageops.so")
    if lib is None:
        return False
    try:
        lib.jpeg_support.restype = ctypes.c_int
        return bool(lib.jpeg_support())
    except Exception:
        return False


def _jpeg_lib():
    lib = _load("libimageops.so")
    if lib is None:
        raise RuntimeError("libimageops.so not built (run make -C csrc)")
    if not getattr(lib, "_jpeg_sigs", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.jpeg_dims_batch.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_long), _c, _i32p,
            _i32p, _i32p, _i32p,
        ]
        lib.jpeg_decode_batch.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_long), _c, _i32p,
            ctypes.POINTER(u8p), _i32p, _i32p, _i32p, _c,
        ]
        lib._jpeg_sigs = True
    return lib


def c_decode_jpeg_batch(blobs, denoms=None, num_threads: int = 4, dims=None):
    """Decode a batch of JPEG byte strings across native threads (GIL-free).

    blobs: list of bytes.  denoms: optional per-image DCT scale denominator
    in {1,2,4,8} (libjpeg scaled decode; the fast_decode path).  dims:
    optional [(w, h, ok)] from a prior c_jpeg_dims_batch with the SAME
    denoms -- skips the second header parse per image.  Returns a list of
    uint8 HWC RGB arrays, with None for images the native decoder cannot
    handle (progressive CMYK etc. -- caller falls back to PIL)."""
    lib = _jpeg_lib()
    n = len(blobs)
    if n == 0:
        return []
    if denoms is None:
        denoms = [1] * n
    u8p = ctypes.POINTER(ctypes.c_uint8)
    bufs = [np.frombuffer(b, np.uint8) for b in blobs]
    ptrs = (u8p * n)(*[b.ctypes.data_as(u8p) for b in bufs])
    sizes = (ctypes.c_long * n)(*[len(b) for b in blobs])
    dn = np.ascontiguousarray(denoms, np.int32)
    if dims is not None:
        assert len(dims) == n
        ws = np.asarray([d[0] for d in dims], np.int32)
        hs = np.asarray([d[1] for d in dims], np.int32)
        oks = np.asarray([int(d[2]) for d in dims], np.int32)
    else:
        ws = np.zeros(n, np.int32)
        hs = np.zeros(n, np.int32)
        oks = np.zeros(n, np.int32)
        lib.jpeg_dims_batch(ptrs, sizes, n, dn.ravel(), ws, hs, oks)
    outs = [
        np.empty((int(hs[i]), int(ws[i]), 3), np.uint8) if oks[i] else None
        for i in range(n)
    ]
    optrs = (u8p * n)(
        *[
            (o.ctypes.data_as(u8p) if o is not None else u8p())
            for o in outs
        ]
    )
    # re-mark unsupported images so decode skips them
    dec_oks = np.array(oks)
    lib.jpeg_decode_batch(ptrs, sizes, n, dn.ravel(), optrs, ws, hs, dec_oks, num_threads)
    return [
        outs[i] if (oks[i] and dec_oks[i]) else None for i in range(n)
    ]


def c_jpeg_dims_batch(blobs, denoms=None):
    """Header-only (w, h, ok) per JPEG blob (native decoder's view)."""
    lib = _jpeg_lib()
    n = len(blobs)
    if n == 0:
        return []
    u8p = ctypes.POINTER(ctypes.c_uint8)
    bufs = [np.frombuffer(b, np.uint8) for b in blobs]
    ptrs = (u8p * n)(*[b.ctypes.data_as(u8p) for b in bufs])
    sizes = (ctypes.c_long * n)(*[len(b) for b in blobs])
    if denoms is None:
        denoms = [1] * n
    dn = np.ascontiguousarray(denoms, np.int32)
    ws = np.zeros(n, np.int32)
    hs = np.zeros(n, np.int32)
    oks = np.zeros(n, np.int32)
    lib.jpeg_dims_batch(ptrs, sizes, n, dn.ravel(), ws, hs, oks)
    return [(int(ws[i]), int(hs[i]), bool(oks[i])) for i in range(n)]
