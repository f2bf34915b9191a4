"""Image decode / resize / normalize pipeline (host side, NHWC).

Reference parity: visreps/dataloaders/obj_cls.py:17-44 — shorter-side
Resize(256) bilinear → CenterCrop(224) (64/64 for tiny-imagenet),
optional flip + rotation(10°) augmentation, scale to [0,1], normalize
with ImageNet / tiny-imagenet stats. Output is float32 NHWC (TPU
convolutions run NHWC; the reference's NCHW is a torch convention).
"""
from __future__ import annotations

import random
from typing import Callable

import numpy as np
from PIL import Image

DS_MEAN = {
    "tiny-imagenet": np.array([0.480, 0.448, 0.398], np.float32),
    "imgnet": np.array([0.485, 0.456, 0.406], np.float32),
}
DS_STD = {
    "tiny-imagenet": np.array([0.272, 0.265, 0.274], np.float32),
    "imgnet": np.array([0.229, 0.224, 0.225], np.float32),
}


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def to_array(img: Image.Image, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - mean) / std


def get_transform(
    ds_stats: str = "imgnet",
    data_augment: bool = False,
    image_size: int = 224,
    preprocess: bool = True,
    rng: random.Random | None = None,
    normalize: bool = True,
) -> Callable[[Image.Image], np.ndarray]:
    """PIL → float32 (H, W, 3) transform closure.

    ``normalize=False`` emits uint8 (4x smaller host→device transfers);
    the extractor/trainer then normalizes on device.
    """
    if not preprocess:
        return lambda img: np.asarray(img.convert("RGB"), np.float32) / 255.0

    if ds_stats == "tiny-imagenet":
        resize_size, crop_size = 64, 64
    else:
        resize_size, crop_size = 256, image_size
    mean, std = DS_MEAN[ds_stats], DS_STD[ds_stats]
    rng = rng or random.Random()

    def _array_fast(arr: np.ndarray) -> np.ndarray | None:
        """PIL-free path for uint8 HWC arrays whose shorter side already
        equals the resize size (e.g. the 256px NSD imgBrick): the
        shorter-side resize is then the identity, so the whole
        transform is a center-crop slice. Bit-exact with the PIL path
        (same round() crop offsets; identity BILINEAR resize is
        value-preserving) — ~10-20x less host CPU per frame, which
        matters when decode threads share cores with upload threads.
        """
        if data_augment or arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
            return None
        h, w = arr.shape[:2]
        if min(h, w) != resize_size or h < crop_size or w < crop_size:
            return None
        top = int(round((h - crop_size) / 2.0))
        left = int(round((w - crop_size) / 2.0))
        out = arr[top: top + crop_size, left: left + crop_size]
        if not normalize:
            return np.ascontiguousarray(out)
        return (np.asarray(out, np.float32) / 255.0 - mean) / std

    def transform(img) -> np.ndarray:
        if not isinstance(img, Image.Image):
            if isinstance(img, np.ndarray):
                out = _array_fast(img)
                if out is not None:
                    return out
            img = load_image(img)
        img = img.convert("RGB")
        img = resize_shorter(img, resize_size)
        img = center_crop(img, crop_size)
        if data_augment:
            if rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            angle = rng.uniform(-10.0, 10.0)
            img = img.rotate(angle, resample=Image.NEAREST)
        if not normalize:
            return np.asarray(img, np.uint8)
        return to_array(img, mean, std)

    # The closure accepts raw dataset values (ndarray/path/PIL) —
    # datasets can skip their own PIL conversion.
    transform.accepts_raw = True
    # Machine-readable description so the native C++ decode path
    # (visreps_tpu/native) can take over for standard pipelines.
    transform.spec = {
        "resize": resize_size,
        "crop": crop_size,
        "mean": tuple(float(m) for m in mean),
        "std": tuple(float(s) for s in std),
        "augment": bool(data_augment),
        "normalize": bool(normalize),
    }
    return transform


def load_image(data_or_path) -> Image.Image:
    """Path / np.ndarray / PIL → RGB PIL image.

    Reference: visreps/dataloaders/neural.py:483-497 (_load_and_transform).
    """
    if isinstance(data_or_path, str):
        return Image.open(data_or_path).convert("RGB")
    if isinstance(data_or_path, np.ndarray):
        return Image.fromarray(data_or_path.astype("uint8"), "RGB")
    if isinstance(data_or_path, Image.Image):
        return data_or_path.convert("RGB") if data_or_path.mode != "RGB" else data_or_path
    # h5py datasets and other array-likes
    arr = np.asarray(data_or_path)
    if arr.ndim == 3:
        return Image.fromarray(arr.astype("uint8"), "RGB")
    raise TypeError(f"Unsupported stimulus type {type(data_or_path)}")
