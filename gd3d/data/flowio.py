"""Stereo-disparity / optical-flow file formats, visualization, augmentation.

Parity targets:
  - dust3r/croco/stereoflow/datasets_stereo.py:541-661 (_read_img, png/pfm/
    npy/hdf5 disparity readers with +inf invalids, _read_pfm/writePFM,
    vis_disparity, the in1k mean/std tensor conversion)
  - dust3r/croco/stereoflow/datasets_flow.py:378-618 (.flo reader/writer
    incl. the 202021.25 tag, KITTI 16-bit png flow codec (u*64+2^15 with a
    validity channel), flo5/hdf5, flowToColor + the Middlebury color wheel)
  - dust3r/croco/stereoflow/augmentor.py (StereoAugmentor :25-157,
    FlowAugmentor :161-290) — numpy ports of the torchvision color ops

All loaders return float32 HxWxC arrays with +inf at invalid pixels, exactly
the convention the losses/metrics in gd3d.stereoflow mask on.
"""
from __future__ import annotations

import os
import re
import struct
import sys
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------

IN1K_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IN1K_STD = np.array([0.229, 0.224, 0.225], np.float32)


def read_img(path: str) -> np.ndarray:
    """datasets_stereo.py:541-544: RGB uint8 (SceneFlow finalpass needs the
    convert)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def img_to_array(img_u8: np.ndarray) -> np.ndarray:
    """datasets_stereo.py:44-46 in NHWC: /255, ImageNet-normalize."""
    return ((img_u8.astype(np.float32) / 255.0) - IN1K_MEAN) / IN1K_STD


# ---------------------------------------------------------------------------
# PFM (datasets_stereo.py:580-640)
# ---------------------------------------------------------------------------


def read_pfm(path: str) -> Tuple[np.ndarray, float]:
    with open(path, "rb") as f:
        header = f.readline().rstrip().decode("ascii")
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dim = re.match(r"^(\d+)\s(\d+)\s$", f.readline().decode("ascii"))
        if not dim:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dim.groups())
        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)), scale


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    if image.dtype != np.float32:
        raise ValueError("Image dtype must be float32.")
    image = np.flipud(image)
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
        image = image.reshape(image.shape[0], image.shape[1])
    else:
        raise ValueError("Image must be HxWx3, HxWx1 or HxW.")
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and sys.byteorder == "little"):
            scale = -scale
        f.write(f"{scale}\n".encode())
        image.tofile(f)


# ---------------------------------------------------------------------------
# disparity codecs (datasets_stereo.py:546-578)
# ---------------------------------------------------------------------------


def read_png_disp(path: str, coef: float = 1.0) -> np.ndarray:
    from PIL import Image

    disp = np.asarray(Image.open(path)).astype(np.float32) / coef
    disp[disp == 0.0] = np.inf
    return disp


def read_kitti_disp(path: str) -> np.ndarray:
    return read_png_disp(path, coef=256.0)


def write_kitti_disp(path: str, disp: np.ndarray) -> None:
    """Inverse of _read_kitti_disp: uint16 at 1/256 px, 0 = invalid."""
    from PIL import Image

    d = np.where(np.isfinite(disp), disp, 0.0)
    Image.fromarray((d * 256.0).round().clip(0, 65535).astype(np.uint16)).save(
        path)


def read_crestereo_disp(path: str) -> np.ndarray:
    return read_png_disp(path, coef=32.0)


def read_pfm_disp(path: str) -> np.ndarray:
    """<=0 -> +inf (datasets_stereo.py:557-560)."""
    disp = np.ascontiguousarray(read_pfm(path)[0]).astype(np.float32)
    disp[disp <= 0] = np.inf
    return disp


def read_hdf5_disp(path: str) -> np.ndarray:
    import h5py

    disp = np.asarray(h5py.File(path)["disparity"])
    disp[np.isnan(disp)] = np.inf
    return disp.astype(np.float32)


# ---------------------------------------------------------------------------
# flow codecs (datasets_flow.py:378-489)
# ---------------------------------------------------------------------------

TAG_FLOAT = 202021.25
TAG_STRING = "PIEH"


def read_flo(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        tag = struct.unpack("f", f.read(4))[0]
        if tag != TAG_FLOAT:
            raise ValueError(f"read_flo({path}): wrong tag")
        w, h = struct.unpack("ii", f.read(8))
        if not (0 < w < 100000 and 0 < h < 100000):
            raise ValueError(f"read_flo({path}): illegal size {w}x{h}")
        flow = np.fromfile(f, "float32")
        if flow.shape != (h * w * 2,):
            raise ValueError(f"read_flo({path}): illegal file size")
        return flow.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    if flow.shape[2:] != (2,):
        raise ValueError("flow must be (H, W, 2)")
    with open(path, "wb") as f:
        f.write(TAG_STRING.encode("utf-8"))
        f.write(struct.pack("ii", flow.shape[1], flow.shape[0]))
        flow.astype(np.float32).tofile(f)


def read_kitti_flow(path: str) -> np.ndarray:
    """datasets_flow.py:455-464: 16-bit BGR png; (v*64+2^15, u..., valid)."""
    import cv2

    flow = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    flow = flow[:, :, ::-1].astype(np.float32)
    valid = flow[:, :, 2] > 0
    flow = flow[:, :, :2]
    flow = (flow - 2 ** 15) / 64.0
    flow[~valid, 0] = np.inf
    flow[~valid, 1] = np.inf
    return flow


def write_kitti_flow(path: str, uv: np.ndarray) -> None:
    """datasets_flow.py:467-471."""
    import cv2

    uv = np.where(np.isfinite(uv), uv, 0.0)
    uv = 64.0 * uv + 2 ** 15
    valid = np.ones([uv.shape[0], uv.shape[1], 1])
    uv = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(path, uv[..., ::-1])


def read_pfm_flow(path: str) -> np.ndarray:
    f, _ = read_pfm(path)
    assert np.all(f[:, :, 2] == 0.0)
    return np.ascontiguousarray(f[:, :, :2]).astype(np.float32)


def read_hdf5_flow(path: str) -> np.ndarray:
    import h5py

    flow = np.asarray(h5py.File(path)["flow"])
    flow[np.isnan(flow)] = np.inf
    return flow.astype(np.float32)


def write_flo5(path: str, flow: np.ndarray) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("flow", data=flow, compression="gzip",
                         compression_opts=5)


# ---------------------------------------------------------------------------
# visualization (datasets_stereo.py:654-660, datasets_flow.py:503-618)
# ---------------------------------------------------------------------------


def vis_disparity(disp: np.ndarray, m=None, M=None) -> np.ndarray:
    import cv2

    if m is None:
        m = disp.min()
    if M is None:
        M = disp.max()
    disp_vis = (disp - m) / max(M - m, 1e-12) * 255.0
    return cv2.applyColorMap(disp_vis.astype("uint8"), cv2.COLORMAP_INFERNO)


_RY, _YG, _GC, _CB, _BM, _MR = 15, 6, 4, 11, 13, 6
_UNKNOWN_THRESH = 1e9


def _colorwheel() -> np.ndarray:
    ncols = _RY + _YG + _GC + _CB + _BM + _MR
    cw = np.zeros((ncols, 3), "uint8")
    col = 0
    cw[:_RY, 0] = 255
    cw[:_RY, 1] = [(255 * i) // _RY for i in range(_RY)]
    col += _RY
    cw[col:col + _YG, 0] = [255 - (255 * i) // _YG for i in range(_YG)]
    cw[col:col + _YG, 1] = 255
    col += _YG
    cw[col:col + _GC, 1] = 255
    cw[col:col + _GC, 2] = [(255 * i) // _GC for i in range(_GC)]
    col += _GC
    cw[col:col + _CB, 1] = [255 - (255 * i) // _CB for i in range(_CB)]
    cw[col:col + _CB, 2] = 255
    col += _CB
    cw[col:col + _BM, 0] = [(255 * i) // _BM for i in range(_BM)]
    cw[col:col + _BM, 2] = 255
    col += _BM
    cw[col:col + _MR, 0] = 255
    cw[col:col + _MR, 2] = [255 - (255 * i) // _MR for i in range(_MR)]
    return cw


def _compute_color(flow: np.ndarray, saturate: bool = True) -> np.ndarray:
    """datasets_flow.py:550-618."""
    flow = flow.copy()
    nanidx = np.isnan(flow[:, :, 0])
    flow[nanidx] = 0.0
    cw = _colorwheel()
    ncols = cw.shape[0]
    rad = np.sqrt(np.sum(np.square(flow), 2))
    a = np.arctan2(-flow[:, :, 1], -flow[:, :, 0]) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype("int")
    k1 = k0 + 1
    k1[k1 == ncols] = 0
    f = fk - k0
    if not saturate:
        rad = np.minimum(rad, 1)
    img = np.zeros((flow.shape[0], flow.shape[1], 3), "uint8")
    for i in range(3):
        tmp = cw[:, i].astype("float")
        col0 = tmp[k0] / 255
        col1 = tmp[k1] / 255
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] *= 0.75
        img[:, :, i] = (255 * col * (1 - nanidx.astype("float"))).astype(
            "uint8")
    return img


def flow_max_norm(flow: np.ndarray) -> float:
    return float(np.max(np.sqrt(np.sum(np.square(flow), 2))))


def flow_to_color(flow: np.ndarray, maxflow=None, maxmaxflow=None,
                  saturate: bool = False) -> np.ndarray:
    """datasets_flow.py:509-537."""
    flow = flow.copy()
    h, w, n = flow.shape
    assert n == 2
    unknown_idx = np.max(np.abs(flow), 2) > _UNKNOWN_THRESH
    flow[unknown_idx] = 0.0
    if maxflow is None:
        maxflow = flow_max_norm(flow)
    if maxmaxflow is not None:
        maxflow = min(maxmaxflow, maxflow)
    eps = np.spacing(1)
    img = _compute_color(flow / (maxflow + eps), saturate=saturate)
    img[np.tile(unknown_idx[:, :, np.newaxis], [1, 1, 3])] = 0.0
    return img


# ---------------------------------------------------------------------------
# color ops (numpy ports of torchvision.transforms.functional adjust_*)
# ---------------------------------------------------------------------------


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(factor * a + (1.0 - factor) * b, 0, 255)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(img.astype(np.float32) * factor, 0, 255)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).mean()
    return _blend(img.astype(np.float32), gray, factor)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]
    return _blend(img.astype(np.float32), gray, factor)


def adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    return np.clip(
        255.0 * gain * np.power(img.astype(np.float32) / 255.0, gamma), 0, 255)


def adjust_hue(img: np.ndarray, hue_factor: float) -> np.ndarray:
    """Shift hue by hue_factor (in [-0.5, 0.5] turns) via HSV."""
    import cv2

    hsv = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2HSV)
    # OpenCV hue is [0, 180)
    hsv[..., 0] = (hsv[..., 0].astype(int) + int(round(hue_factor * 180))) % 180
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)


# ---------------------------------------------------------------------------
# augmentors (augmentor.py) — numpy/cv2 ports, explicit RandomState
# ---------------------------------------------------------------------------


class StereoAugmentor:
    """augmentor.py:25-157: x-only random scale, random crop, v-flip,
    right-view rotate/shift jitter, (a)symmetric color transforms."""

    def __init__(self, crop_size, scale_prob=0.5, scale_xonly=True,
                 lhth=800.0, lminscale=0.0, lmaxscale=1.0, hminscale=-0.2,
                 hmaxscale=0.4, scale_interp_nearest=True, rightjitterprob=0.5,
                 v_flip_prob=0.5, color_aug_asym=True, color_choice_prob=0.5,
                 rng: Optional[np.random.RandomState] = None):
        self.crop_size = crop_size
        self.scale_prob = scale_prob
        self.scale_xonly = scale_xonly
        self.lhth = lhth
        self.lminscale, self.lmaxscale = lminscale, lmaxscale
        self.hminscale, self.hmaxscale = hminscale, hmaxscale
        self.scale_interp_nearest = scale_interp_nearest
        self.rightjitterprob = rightjitterprob
        self.v_flip_prob = v_flip_prob
        self.color_aug_asym = color_aug_asym
        self.color_choice_prob = color_choice_prob
        self.rng = rng if rng is not None else np.random.RandomState()

    def _random_scale(self, img1, img2, disp):
        import cv2

        ch, cw = self.crop_size
        h, w = img1.shape[:2]
        interp_d = (cv2.INTER_NEAREST if self.scale_interp_nearest
                    else cv2.INTER_LINEAR)
        if self.scale_prob > 0.0 and self.rng.rand() < self.scale_prob:
            mn, mx = ((self.lminscale, self.lmaxscale) if min(h, w) < self.lhth
                      else (self.hminscale, self.hmaxscale))
            sx = float(np.clip(2.0 ** self.rng.uniform(mn, mx),
                               (cw + 8) / float(w), None))
            sy = 1.0 if self.scale_xonly else float(
                np.clip(sx, (ch + 8) / float(h), None))
            img1 = cv2.resize(img1, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            disp = cv2.resize(disp, None, fx=sx, fy=sy,
                              interpolation=interp_d) * sx
        else:
            clip_scale = (cw + 8) / float(w)
            if clip_scale > 1.0:
                sx = clip_scale
                sy = sx if not self.scale_xonly else 1.0
                img1 = cv2.resize(img1, None, fx=sx, fy=sy,
                                  interpolation=cv2.INTER_LINEAR)
                img2 = cv2.resize(img2, None, fx=sx, fy=sy,
                                  interpolation=cv2.INTER_LINEAR)
                disp = cv2.resize(disp, None, fx=sx, fy=sy,
                                  interpolation=interp_d) * sx
        return img1, img2, disp

    def _random_crop(self, img1, img2, disp):
        h, w = img1.shape[:2]
        ch, cw = self.crop_size
        assert ch <= h and cw <= w, (img1.shape, ch, cw)
        ox = self.rng.randint(w - cw + 1)
        oy = self.rng.randint(h - ch + 1)
        return (img1[oy:oy + ch, ox:ox + cw], img2[oy:oy + ch, ox:ox + cw],
                disp[oy:oy + ch, ox:ox + cw])

    def _random_vflip(self, img1, img2, disp):
        if self.v_flip_prob > 0 and self.rng.rand() < self.v_flip_prob:
            img1 = np.copy(np.flipud(img1))
            img2 = np.copy(np.flipud(img2))
            disp = np.copy(np.flipud(disp))
        return img1, img2, disp

    def _random_rotate_shift_right(self, img2):
        import cv2

        if self.rightjitterprob > 0.0 and self.rng.rand() < self.rightjitterprob:
            angle, pixel = 0.1, 2
            px = self.rng.uniform(-pixel, pixel)
            ag = self.rng.uniform(-angle, angle)
            center = (self.rng.uniform(0, img2.shape[0]),
                      self.rng.uniform(0, img2.shape[1]))
            rot = cv2.getRotationMatrix2D(center, ag, 1.0)
            img2 = cv2.warpAffine(img2, rot, img2.shape[1::-1],
                                  flags=cv2.INTER_LINEAR)
            trans = np.float32([[1, 0, 0], [0, 1, px]])
            img2 = cv2.warpAffine(img2, trans, img2.shape[1::-1],
                                  flags=cv2.INTER_LINEAR)
        return img2

    def _color_pair(self, op, lo, hi, img1, img2):
        v = self.rng.uniform(lo, hi)
        img1 = op(img1, v)
        if self.color_aug_asym and self.rng.rand() < 0.5:
            v = self.rng.uniform(lo, hi)
        img2 = op(img2, v)
        return img1, img2

    def _random_color(self, img1, img2):
        trfs = [
            lambda a, b: (self._color_pair(adjust_contrast, 0.8, 1.2, a, b)
                          if self.rng.rand() < 0.5 else (a, b)),
            lambda a, b: (self._color_pair(adjust_gamma, 0.7, 1.5, a, b)
                          if self.rng.rand() < 0.5 else (a, b)),
            lambda a, b: (self._color_pair(adjust_brightness, 0.5, 2.0, a, b)
                          if self.rng.rand() < 0.5 else (a, b)),
            lambda a, b: (self._color_pair(adjust_hue, -0.1, 0.1, a, b)
                          if self.rng.rand() < 0.5 else (a, b)),
            lambda a, b: (self._color_pair(adjust_saturation, 0.8, 1.2, a, b)
                          if self.rng.rand() < 0.5 else (a, b)),
        ]
        img1 = img1.astype(np.float32)
        img2 = img2.astype(np.float32)
        if self.rng.rand() < self.color_choice_prob:
            t = trfs[self.rng.randint(len(trfs))]
            img1, img2 = t(img1, img2)
        else:
            order = self.rng.permutation(len(trfs))
            for i in order:
                img1, img2 = trfs[i](img1, img2)
        return img1.astype(np.float32), img2.astype(np.float32)

    def __call__(self, img1, img2, disp, dataset_name=""):
        img1, img2, disp = self._random_scale(img1, img2, disp)
        img1, img2, disp = self._random_crop(img1, img2, disp)
        img1, img2, disp = self._random_vflip(img1, img2, disp)
        img2 = self._random_rotate_shift_right(img2)
        img1, img2 = self._random_color(img1, img2)
        return img1, img2, disp


class FlowAugmentor:
    """augmentor.py:161-290: spatial scale/stretch + h/v flips with flow
    sign fixes, sparse-flow-aware resize, photometric jitter."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 spatial_aug_prob=0.8, stretch_prob=0.8, max_stretch=0.2,
                 h_flip_prob=0.5, v_flip_prob=0.1,
                 asymmetric_color_aug_prob=0.2,
                 rng: Optional[np.random.RandomState] = None):
        self.crop_size = crop_size
        self.min_scale, self.max_scale = min_scale, max_scale
        self.spatial_aug_prob = spatial_aug_prob
        self.stretch_prob = stretch_prob
        self.max_stretch = max_stretch
        self.h_flip_prob = h_flip_prob
        self.v_flip_prob = v_flip_prob
        self.asymmetric_color_aug_prob = asymmetric_color_aug_prob
        self.rng = rng if rng is not None else np.random.RandomState()

    def _jitter(self, img):
        # ColorJitter(brightness=.4, contrast=.4, saturation=.4, hue=.5/3.14)
        img = adjust_brightness(img, self.rng.uniform(0.6, 1.4))
        img = adjust_contrast(img, self.rng.uniform(0.6, 1.4))
        img = adjust_saturation(img, self.rng.uniform(0.6, 1.4))
        h = 0.5 / 3.14
        img = adjust_hue(img, self.rng.uniform(-h, h))
        return img

    def color_transform(self, img1, img2):
        if self.rng.rand() < self.asymmetric_color_aug_prob:
            img1 = self._jitter(img1).astype(np.uint8)
            img2 = self._jitter(img2).astype(np.uint8)
        else:
            stack = np.concatenate([img1, img2], axis=0)
            stack = self._jitter(stack).astype(np.uint8)
            img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def _resize_flow(self, flow, scale_x, scale_y, factor=1.0):
        import cv2

        if np.all(np.isfinite(flow)):
            flow = cv2.resize(flow, None, fx=scale_x / factor,
                              fy=scale_y / factor,
                              interpolation=cv2.INTER_LINEAR)
            flow = flow * [scale_x, scale_y]
        else:  # sparse version (augmentor.py:202-231)
            ht, wd = flow.shape[:2]
            coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)),
                              axis=-1).reshape(-1, 2).astype(np.float32)
            flow = flow.reshape(-1, 2).astype(np.float32)
            valid = np.isfinite(flow[:, 0])
            coords0 = coords[valid]
            flow0 = flow[valid]
            ht1 = int(round(ht * scale_y / factor))
            wd1 = int(round(wd * scale_x / factor))
            rescale = np.array([[scale_x, scale_y]])
            coords1 = coords0 * rescale / factor
            flow1 = flow0 * rescale
            xx = np.round(coords1[:, 0]).astype(np.int32)
            yy = np.round(coords1[:, 1]).astype(np.int32)
            v = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
            flow = np.inf * np.ones([ht1, wd1, 2], dtype=np.float32)
            flow[yy[v], xx[v]] = flow1[v]
        return flow

    def spatial_transform(self, img1, img2, flow, dname=""):
        import cv2

        if self.rng.rand() < self.spatial_aug_prob:
            ht, wd = img1.shape[:2]
            clip_min = np.maximum((self.crop_size[0] + 8) / float(ht),
                                  (self.crop_size[1] + 8) / float(wd))
            scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
            sx = sy = scale
            if self.rng.rand() < self.stretch_prob:
                sx *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
                sy *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
            sx = float(np.clip(sx, clip_min, None))
            sy = float(np.clip(sy, clip_min, None))
            img1 = cv2.resize(img1, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            flow = self._resize_flow(
                flow, sx, sy, factor=2.0 if dname == "Spring" else 1.0)
        elif dname == "Spring":
            flow = self._resize_flow(flow, 1.0, 1.0, factor=2.0)

        if self.h_flip_prob > 0.0 and self.rng.rand() < self.h_flip_prob:
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
        if self.v_flip_prob > 0.0 and self.rng.rand() < self.v_flip_prob:
            img1 = img1[::-1, :]
            img2 = img2[::-1, :]
            flow = flow[::-1, :] * [1.0, -1.0]

        y0 = (self.rng.randint(0, img1.shape[0] - self.crop_size[0])
              if img1.shape[0] - self.crop_size[0] > 0 else 0)
        x0 = (self.rng.randint(0, img1.shape[1] - self.crop_size[1])
              if img1.shape[1] - self.crop_size[1] > 0 else 0)
        img1 = img1[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        img2 = img2[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        flow = flow[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1, img2, flow

    def __call__(self, img1, img2, flow, dname=""):
        img1, img2, flow = self.spatial_transform(img1, img2, flow, dname)
        img1, img2 = self.color_transform(img1, img2)
        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow))


# ---------------------------------------------------------------------------
# datasets: pair discovery for the reference layouts + a generic loader
# ---------------------------------------------------------------------------

def read_gt(path: str, task: str) -> np.ndarray:
    """Dispatch on extension + task; returns HxWxC float32 with +inf
    invalids (C=1 disparity, C=2 flow)."""
    ext = os.path.splitext(path)[1].lower()
    if task == "stereo":
        if ext == ".pfm":
            d = read_pfm_disp(path)
        elif ext == ".png":
            d = read_kitti_disp(path)
        elif ext == ".npy":
            d = np.load(path).astype(np.float32)
        elif ext in (".hdf5", ".h5"):
            d = read_hdf5_disp(path)
        else:
            raise ValueError(f"unknown disparity format: {path}")
        return d[..., None] if d.ndim == 2 else d
    if ext == ".flo":
        return read_flo(path)
    if ext == ".png":
        return read_kitti_flow(path)
    if ext == ".pfm":
        return read_pfm_flow(path)
    if ext == ".npy":
        return np.load(path).astype(np.float32)
    if ext in (".hdf5", ".h5", ".flo5"):
        return read_hdf5_flow(path)
    raise ValueError(f"unknown flow format: {path}")


def discover_pairs(root: str, layout: str, task: str,
                   split: str = "train") -> List[Tuple[str, str, Optional[str]]]:
    """(img1, img2, gt-or-None) triplets for the reference dataset layouts.

    layouts: 'generic' (left/ right/ gt/ with matching stems — the gd3d
    interchange tree), 'sceneflow' (frames_finalpass + disparity),
    'kitti15' (stereo: image_2/3 + disp_occ_0; flow: image_2 _10/_11 +
    flow_occ), 'sintel' (training/{clean,final} + flow), 'eth3d',
    'middlebury' (two_view_ folders with im0/im1 + disp0GT.pfm).
    """
    import glob as _glob

    j = os.path.join
    pairs: List[Tuple[str, str, Optional[str]]] = []
    if layout == "generic":
        lefts = sorted(_glob.glob(j(root, "left", "*")))
        for L in lefts:
            stem = os.path.splitext(os.path.basename(L))[0]
            rs = _glob.glob(j(root, "right", stem + ".*"))
            gs = _glob.glob(j(root, "gt", stem + ".*"))
            if rs:
                pairs.append((L, rs[0], gs[0] if gs else None))
    elif layout == "sceneflow":
        for L in sorted(_glob.glob(
                j(root, "**", "left", "*.png"), recursive=True)):
            R = L.replace(os.sep + "left" + os.sep, os.sep + "right" + os.sep)
            g = (L.replace("frames_finalpass", "disparity")
                  .replace("frames_cleanpass", "disparity")
                  .replace(".png", ".pfm"))
            if os.path.isfile(R):
                pairs.append((L, R, g if os.path.isfile(g) else None))
    elif layout == "kitti15" and task == "stereo":
        sub = "training" if split == "train" else "testing"
        for L in sorted(_glob.glob(j(root, sub, "image_2", "*_10.png"))):
            R = L.replace("image_2", "image_3")
            g = L.replace("image_2", "disp_occ_0")
            if os.path.isfile(R):
                pairs.append((L, R, g if os.path.isfile(g) else None))
    elif layout == "kitti15":
        sub = "training" if split == "train" else "testing"
        for L in sorted(_glob.glob(j(root, sub, "image_2", "*_10.png"))):
            R = L.replace("_10.png", "_11.png")
            g = L.replace("image_2", "flow_occ")
            if os.path.isfile(R):
                pairs.append((L, R, g if os.path.isfile(g) else None))
    elif layout == "sintel":
        # both render passes, like the reference's SintelDataset
        # (datasets_flow.py: 'clean' + 'final' subsets)
        for render in ("clean", "final"):
            for L in sorted(_glob.glob(
                    j(root, split + "ing", render, "*", "frame_*.png"))):
                seq = os.path.dirname(L)
                idx = int(os.path.basename(L)[len("frame_"):-len(".png")])
                R = j(seq, f"frame_{idx + 1:04d}.png")
                g = (seq.replace(os.sep + render + os.sep,
                                 os.sep + "flow" + os.sep)
                     + os.sep + f"frame_{idx:04d}.flo")
                if os.path.isfile(R):
                    pairs.append((L, R, g if os.path.isfile(g) else None))
    elif layout == "eth3d":
        for d in sorted(_glob.glob(j(root, "two_view_*", "*"))):
            L, R = j(d, "im0.png"), j(d, "im1.png")
            g = j(d, "disp0GT.pfm")
            if os.path.isfile(L) and os.path.isfile(R):
                pairs.append((L, R, g if os.path.isfile(g) else None))
    elif layout == "middlebury":
        for d in sorted(_glob.glob(j(root, "*"))):
            L, R = j(d, "im0.png"), j(d, "im1.png")
            g = j(d, "disp0.pfm")
            if os.path.isfile(L) and os.path.isfile(R):
                pairs.append((L, R, g if os.path.isfile(g) else None))
    else:
        raise ValueError(f"unknown layout {layout!r} for task {task!r}")
    return pairs


class StereoFlowPairs:
    """Minimal map-style dataset over (img1, img2, gt) triplets; applies the
    task augmentor when crop_size is given (training) and ImageNet
    normalization always. Returns dict of float32 NHW C arrays."""

    def __init__(self, pairs: Sequence[Tuple[str, str, Optional[str]]],
                 task: str, crop_size: Optional[Tuple[int, int]] = None,
                 seed: int = 0, root: Optional[str] = None):
        self.pairs = list(pairs)
        self.task = task
        self.crop_size = crop_size
        self.root = root  # names become root-relative (unique across scenes)
        self.rng = np.random.RandomState(seed)
        if crop_size is None:
            self.augmentor = None
        elif task == "stereo":
            self.augmentor = StereoAugmentor(crop_size, rng=self.rng)
        else:
            self.augmentor = FlowAugmentor(crop_size, rng=self.rng)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        Lp, Rp, gp = self.pairs[idx]
        img1 = read_img(Lp)
        img2 = read_img(Rp)
        gt = read_gt(gp, self.task) if gp is not None else None
        if self.augmentor is not None:
            assert gt is not None, "training requires ground truth"
            g = gt[..., 0] if self.task == "stereo" else gt
            img1, img2, g = self.augmentor(img1, img2, g)
            gt = g[..., None] if self.task == "stereo" else g
        out = {"img1": img_to_array(np.asarray(img1, np.float32)),
               "img2": img_to_array(np.asarray(img2, np.float32))}
        if gt is not None:
            out["gt"] = np.ascontiguousarray(gt, np.float32)
        if self.root:
            # scene-qualified like the reference's pairname_to_str — bare
            # stems collide across eth3d/middlebury scenes (every left
            # image is im0.png)
            rel = os.path.splitext(os.path.relpath(Lp, self.root))[0]
            out["name"] = rel.replace(os.sep, "_")
        else:
            out["name"] = os.path.splitext(os.path.basename(Lp))[0]
        return out
