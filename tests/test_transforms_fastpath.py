"""The PIL-free array fast path must be bit-exact with the PIL path.

The NSD imgBrick serves 256x256 uint8 frames; shorter-side Resize(256)
is then the identity, so get_transform's numpy fast path replaces the
fromarray -> resize -> crop -> asarray round-trip with one slice.
Reference pipeline being matched: visreps/dataloaders/obj_cls.py:17-44.
"""
import numpy as np
import pytest
from PIL import Image

from visreps_tpu.data.transforms import center_crop, get_transform, resize_shorter, to_array, DS_MEAN, DS_STD


def _pil_reference(arr: np.ndarray, normalize: bool) -> np.ndarray:
    img = Image.fromarray(arr, "RGB").convert("RGB")
    img = resize_shorter(img, 256)
    img = center_crop(img, 224)
    if not normalize:
        return np.asarray(img, np.uint8)
    return to_array(img, DS_MEAN["imgnet"], DS_STD["imgnet"])


@pytest.mark.parametrize("shape", [(256, 256), (256, 320), (320, 256), (256, 257)])
@pytest.mark.parametrize("normalize", [False, True])
def test_fast_path_bit_exact(shape, normalize):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    t = get_transform("imgnet", data_augment=False, normalize=normalize)
    out = t(arr)
    ref = _pil_reference(arr, normalize)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("shape", [(300, 320), (200, 256), (512, 512)])
def test_ineligible_shapes_fall_back_to_pil(shape):
    """Shorter side != 256 -> real resample; must match PIL exactly
    (it IS the PIL path)."""
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    t = get_transform("imgnet", data_augment=False, normalize=False)
    out = t(arr)
    ref = _pil_reference(arr, False)
    np.testing.assert_array_equal(out, ref)


def test_augment_falls_back_to_pil():
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, size=(256, 256, 3), dtype=np.uint8)
    import random

    t = get_transform("imgnet", data_augment=True, rng=random.Random(7))
    t2 = get_transform("imgnet", data_augment=True, rng=random.Random(7))
    out = t(arr)
    ref = t2(Image.fromarray(arr, "RGB"))
    np.testing.assert_array_equal(out, ref)


def test_stimuli_dataset_uses_raw_values():
    from visreps_tpu.data.loader import StimuliDataset

    rng = np.random.RandomState(3)
    stimuli = {str(i): rng.randint(0, 256, size=(256, 256, 3), dtype=np.uint8)
               for i in range(4)}
    t = get_transform("imgnet", normalize=False)
    ds = StimuliDataset(stimuli, t)
    arr, key = ds[0]
    assert arr.shape == (224, 224, 3) and arr.dtype == np.uint8
    np.testing.assert_array_equal(arr, _pil_reference(stimuli[ds.keys[0]], False))
