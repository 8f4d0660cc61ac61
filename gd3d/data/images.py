"""Teacher-format image loading.

Parity targets:
  - dust3r load_images (dust3r/dust3r/utils/image.py:73-126): long side ->
    `size`, center-crop to /16-divisible halves, 3:4 crop for square inputs,
    Normalize(0.5, 0.5) => [-1, 1]; returns img + true_shape.
  - VGGT load_and_preprocess_images (vggt/utils/load_fn.py:12-146), "crop"
    mode: width -> 518, height rounded to /14, center-crop height to <=518;
    values in [0, 1].

NHWC numpy outputs (the reference is NCHW torch).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np
from PIL import Image

from gd3d import native_runtime

ImageLike = Union[str, Image.Image, np.ndarray]


def _to_pil(img: ImageLike) -> Image.Image:
    if isinstance(img, str):
        from PIL import ImageOps

        # dust3r load_images applies the EXIF orientation before any
        # resize/crop (dust3r/utils/image.py:98) — phone JPEGs would
        # otherwise enter the pipeline rotated
        im = ImageOps.exif_transpose(Image.open(img))
        if im.mode == "RGBA":
            bg = Image.new("RGBA", im.size, (255, 255, 255, 255))
            im = Image.alpha_composite(bg, im)
        return im.convert("RGB")
    if isinstance(img, Image.Image):
        return img.convert("RGB")
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return Image.fromarray(arr)


def _resize_pil(img: Image.Image, long_edge: int) -> Image.Image:
    """dust3r _resize_pil_image: LANCZOS when downscaling, BICUBIC upscaling."""
    S = max(img.size)
    interp = Image.LANCZOS if S > long_edge else Image.BICUBIC
    new_size = tuple(int(round(x * long_edge / S)) for x in img.size)
    return img.resize(new_size, interp)


def load_image_mast3r(
    img: ImageLike, size: int = 512, square_ok: bool = False
) -> Dict[str, np.ndarray]:
    """One image -> {'img': (H, W, 3) float32 in [-1, 1], 'true_shape': (2,)}."""
    im = _to_pil(img)
    if size == 224:
        im = _resize_pil(im, round(size * max(im.size) / min(im.size)))
    else:
        im = _resize_pil(im, size)
    W, H = im.size
    cx, cy = W // 2, H // 2
    if size == 224:
        half = min(cx, cy)
        im = im.crop((cx - half, cy - half, cx + half, cy + half))
    else:
        halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
        if not square_ok and W == H:
            halfh = int(3 * halfw / 4)
        im = im.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))
    # /255 then Normalize(0.5, 0.5) => [-1, 1]; native threaded loop when
    # libgd3d_native.so is built, numpy fallback otherwise
    arr = native_runtime.u8_to_f32_norm(
        np.asarray(im), mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
    )
    return {
        "img": arr,
        "true_shape": np.int32([im.size[1], im.size[0]]),
    }


def load_images_vggt(
    imgs: Sequence[ImageLike], mode: str = "crop", target_size: int = 518
) -> np.ndarray:
    """Images -> (S, H, W, 3) float32 in [0, 1], width 518, height /14."""
    assert mode in ("crop", "pad")
    out: List[np.ndarray] = []
    shapes = set()
    for img in imgs:
        im = _to_pil(img)
        width, height = im.size
        if mode == "pad":
            if width >= height:
                new_w = target_size
                new_h = round(height * (new_w / width) / 14) * 14
            else:
                new_h = target_size
                new_w = round(width * (new_h / height) / 14) * 14
        else:
            new_w = target_size
            new_h = round(height * (new_w / width) / 14) * 14
        im = im.resize((new_w, new_h), Image.Resampling.BICUBIC)
        arr = native_runtime.u8_to_f32_norm(
            np.asarray(im), mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)
        )
        if mode == "crop" and new_h > target_size:
            start = (new_h - target_size) // 2
            arr = arr[start : start + target_size]
        if mode == "pad":
            hp = target_size - arr.shape[0]
            wp = target_size - arr.shape[1]
            arr = np.pad(
                arr,
                ((hp // 2, hp - hp // 2), (wp // 2, wp - wp // 2), (0, 0)),
                constant_values=1.0,
            )
        shapes.add(arr.shape[:2])
        out.append(arr)
    assert len(shapes) == 1, f"inconsistent shapes {shapes}"
    return np.stack(out)
