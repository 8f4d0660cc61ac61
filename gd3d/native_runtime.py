"""ctypes bindings for the native host-runtime library (native/*.cpp).

Falls back to numpy implementations transparently when the shared library
has not been built (`native/build.sh`). The native path accelerates the host
data pipeline: image resize/normalize, depth rasterization and keypoint
padding — the loops that must keep up with the device step.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "libgd3d_native.so",
)

_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64
    lib.gd3d_resize_bilinear_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64]
    lib.gd3d_u8_to_f32_norm.argtypes = [u8p, i64, i64, f32p, f32p, f32p]
    lib.gd3d_point_cloud_to_depth.argtypes = [f32p, i64, f32p, i64, i64, f32p, i32p]
    lib.gd3d_pad_keypoints.argtypes = [f32p, f32p, u8p, i64, i64, f32p, f32p, u8p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.gd3d_rasterize_mesh.argtypes = [
        f64p, i64, i32p, i64, f32p, f64p, i64, i64, f32p, f32p]
    lib.gd3d_version.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """(H, W, C) float32 -> (OH, OW, C); half-pixel bilinear."""
    lib = load_library()
    img = np.ascontiguousarray(img, np.float32)
    H, W, C = img.shape
    OH, OW = out_hw
    if lib is None:
        return _resize_numpy(img, out_hw)
    out = np.empty((OH, OW, C), np.float32)
    lib.gd3d_resize_bilinear_f32(_fp(img), H, W, C, _fp(out), OH, OW)
    return out


def _resize_numpy(img: np.ndarray, out_hw) -> np.ndarray:
    H, W, C = img.shape
    OH, OW = out_hw
    fy = (np.arange(OH) + 0.5) * (H / OH) - 0.5
    fx = (np.arange(OW) + 0.5) * (W / OW) - 0.5
    y0 = np.floor(fy).astype(int)
    x0 = np.floor(fx).astype(int)
    ty = (fy - y0)[:, None, None]
    tx = (fx - x0)[None, :, None]
    y0c = np.clip(y0, 0, H - 1)
    y1c = np.clip(y0 + 1, 0, H - 1)
    x0c = np.clip(x0, 0, W - 1)
    x1c = np.clip(x0 + 1, 0, W - 1)
    top = img[y0c][:, x0c] * (1 - tx) + img[y0c][:, x1c] * tx
    bot = img[y1c][:, x0c] * (1 - tx) + img[y1c][:, x1c] * tx
    return (top * (1 - ty) + bot * ty).astype(np.float32)


def u8_to_f32_norm(img: np.ndarray, mean, std) -> np.ndarray:
    """(..., C) uint8 -> float32, /255 then channel (x-mean)/std."""
    lib = load_library()
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if lib is None:
        return ((img.astype(np.float32) / 255.0) - mean) / std
    img = np.ascontiguousarray(img, np.uint8)
    C = img.shape[-1]
    N = img.size // C
    out = np.empty(img.shape, np.float32)
    lib.gd3d_u8_to_f32_norm(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), N, C,
        _fp(mean), _fp(std), _fp(out),
    )
    return out


def point_cloud_to_depth(points: np.ndarray, K: np.ndarray, w: int, h: int
                         ) -> np.ndarray:
    """Host-side average-Z rasterization matching gd3d.ops.geometry."""
    lib = load_library()
    points = np.ascontiguousarray(points, np.float32)
    K = np.ascontiguousarray(K, np.float32)
    if lib is None:
        return _pcd_numpy(points, K, w, h)
    depth = np.zeros((h, w), np.float32)
    counts = np.zeros((h, w), np.int32)
    lib.gd3d_point_cloud_to_depth(
        _fp(points), points.shape[0], _fp(K), w, h, _fp(depth),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return depth


def _pcd_numpy(points, K, w, h):
    Z = points[:, 2]
    ok = Z > 0
    u = np.round(points[ok, 0] / Z[ok] * K[0, 0] + K[0, 2]).astype(int)
    v = np.round(points[ok, 1] / Z[ok] * K[1, 1] + K[1, 2]).astype(int)
    z = Z[ok]
    m = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    idx = v[m] * w + u[m]
    s = np.bincount(idx, weights=z[m], minlength=h * w)
    c = np.bincount(idx, minlength=h * w)
    out = np.where(c > 0, s / np.maximum(c, 1), 0.0)
    return out.reshape(h, w).astype(np.float32)


def rasterize_mesh(cam_verts: np.ndarray, faces: np.ndarray,
                   colors: np.ndarray, K: np.ndarray, h: int, w: int
                   ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Z-buffer rasterize camera-space triangles -> (rgb f32 [0,1], depth)
    with depth=+inf on misses. Returns None when the library is unbuilt
    (caller falls back to the numpy path in render_synthetic.render_mesh)."""
    lib = load_library()
    if lib is None:
        return None
    cam_verts = np.ascontiguousarray(cam_verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int32)
    colors = np.ascontiguousarray(colors, np.float32)
    K = np.ascontiguousarray(K, np.float64)
    rgb = np.zeros((h, w, 3), np.float32)
    depth = np.full((h, w), np.inf, np.float32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.gd3d_rasterize_mesh(
        cam_verts.ctypes.data_as(f64p), cam_verts.shape[0],
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), faces.shape[0],
        _fp(colors), K.ctypes.data_as(f64p), h, w, _fp(rgb), _fp(depth),
    )
    return rgb, depth


def pad_keypoints(kps: np.ndarray, pts3d: np.ndarray, capacity: int,
                  valid: Optional[np.ndarray] = None):
    lib = load_library()
    kps = np.ascontiguousarray(kps, np.float32)
    pts3d = np.ascontiguousarray(pts3d, np.float32)
    n = kps.shape[0]
    if lib is None:
        from gd3d.data.loader import pad_keypoints as np_pad

        return np_pad(kps, pts3d, capacity, valid)
    ko = np.empty((capacity, 2), np.float32)
    po = np.empty((capacity, 3), np.float32)
    vo = np.empty((capacity,), np.uint8)
    vin = None
    if valid is not None:
        vin = np.ascontiguousarray(valid, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        )
    lib.gd3d_pad_keypoints(
        _fp(kps), _fp(pts3d), vin, n, capacity, _fp(ko), _fp(po),
        vo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return ko, po, vo.astype(bool)
