"""Native C++ JPEG pipeline tests: PIL parity + loader integration."""
import numpy as np
import pytest
from PIL import Image

from visreps_tpu.data.loader import LabeledDataset, PrefetchLoader, StimuliDataset
from visreps_tpu.data.transforms import get_transform, load_image

native = pytest.importorskip("visreps_tpu.native")
if not native.native_available():
    pytest.skip("native fastimage library unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (300, 300), (500, 333), (240, 260)]):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = root / f"img{i}.jpg"
        Image.fromarray(img).save(p, quality=92)
        paths.append(str(p))
    return paths


class TestDecodeParity:
    def test_matches_pil_pipeline(self, jpegs):
        tfm = get_transform("imgnet")
        out = native.decode_batch(jpegs, 256, 224)
        for i, p in enumerate(jpegs):
            ref = tfm(load_image(p))
            # PIL quantizes to uint8 between resize passes; the native
            # path keeps float32 — bounded by ~1 uint8 step / std.
            assert np.abs(out[i] - ref).mean() < 0.02
            assert np.abs(out[i] - ref).max() < 0.15

    def test_hflip(self, jpegs):
        out = native.decode_batch(jpegs[:1], 256, 224)
        flipped = native.decode_batch(jpegs[:1], 256, 224, hflip=np.array([1], np.uint8))
        np.testing.assert_allclose(out[0], flipped[0, :, ::-1], atol=1e-6)

    def test_u8_matches_float_route(self, jpegs):
        """decode_batch_u8 ≡ the former uint8 route (float decode with
        identity mean / std=1/255, then numpy rint/clip/astype) — the
        C++ rounding replaced three host-side numpy passes, not the
        math."""
        raw = native.decode_batch(jpegs, 256, 224, mean=(0, 0, 0),
                                  std=(1 / 255,) * 3)
        ref = np.clip(np.rint(raw), 0, 255).astype(np.uint8)
        out = native.decode_batch_u8(jpegs, 256, 224)
        np.testing.assert_array_equal(out, ref)

    def test_identity_resize_shortcut(self, tmp_path):
        """Images already at the resize size skip the float resampler
        (both output modes) — must stay bit-identical to the general
        path's triangle filter, which is exact at scale 1."""
        rng = np.random.RandomState(7)
        img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "id.png")  # PNG: lossless, decode == img
        Image.fromarray(img).save(p)
        out8 = native.decode_batch_u8([p], 256, 224)
        np.testing.assert_array_equal(out8[0], img[16:240, 16:240])
        outf = native.decode_batch([p], 256, 224, mean=(0, 0, 0), std=(1, 1, 1))
        np.testing.assert_allclose(
            outf[0], img[16:240, 16:240].astype(np.float32) / 255.0, atol=1e-7)

    def test_bad_path_zero_filled(self, jpegs):
        out = native.decode_batch([jpegs[0], "/nonexistent/x.jpg"], 256, 224,
                                  mean=(0, 0, 0), std=(1, 1, 1))
        assert np.abs(out[1]).max() == 0.0
        assert np.abs(out[0]).max() > 0.0


class TestLoaderIntegration:
    def test_labeled_dataset_native_path(self, jpegs):
        tfm = get_transform("imgnet", data_augment=False)
        samples = [(p, i, f"img{i}.jpg") for i, p in enumerate(jpegs)]
        ds = LabeledDataset(samples, tfm)
        batch, labels = ds.native_batch(range(len(jpegs)))
        assert batch.shape == (4, 224, 224, 3)
        assert labels == [0, 1, 2, 3]
        # loader end-to-end consistency with the PIL item path
        loader = PrefetchLoader(ds, batch_size=4, shuffle=False, num_workers=2)
        (nb, nl), = list(loader)
        ref0, _ = ds[0]
        assert np.abs(nb[0] - ref0).mean() < 0.02

    def test_augment_spec_blocks_native(self, jpegs, monkeypatch):
        monkeypatch.delenv("VISREPS_NATIVE_AUGMENT", raising=False)
        tfm = get_transform("imgnet", data_augment=True)
        ds = LabeledDataset([(jpegs[0], 0, "a.jpg")], tfm)
        assert ds.native_batch([0]) is None

    def test_stimuli_dataset_native_path(self, jpegs):
        tfm = get_transform("imgnet")
        stimuli = {f"s{i}": p for i, p in enumerate(jpegs)}
        ds = StimuliDataset(stimuli, tfm)
        batch, keys = ds.native_batch(range(len(jpegs)))
        assert batch.shape == (4, 224, 224, 3)
        assert keys == sorted(stimuli.keys())

    def test_uint8_transfer_native_path(self, jpegs):
        """normalize=False (uint8_transfer) now decodes through the C++
        path too: identity mean / std=1/255 → rint → uint8. Parity with
        the PIL uint8 path is bounded by the same resample tolerance as
        the normalized mode (~1-2 gray levels mean)."""
        tfm = get_transform("imgnet", normalize=False)
        stimuli = {f"s{i}": p for i, p in enumerate(jpegs)}
        ds = StimuliDataset(stimuli, tfm)
        res = ds.native_batch(range(len(jpegs)))
        assert res is not None
        batch, keys = res
        assert batch.dtype == np.uint8
        assert batch.shape == (4, 224, 224, 3)
        assert keys == sorted(stimuli.keys())
        for i in range(len(jpegs)):
            ref = ds.transform(load_image(jpegs[i]))  # PIL uint8 path
            assert ref.dtype == np.uint8
            diff = np.abs(batch[i].astype(np.int16) - ref.astype(np.int16))
            assert diff.mean() < 2.0
            assert diff.max() <= 40

    def test_non_path_stimuli_fall_back(self, jpegs, rng):
        tfm = get_transform("imgnet")
        stimuli = {"a": (rng.rand(64, 64, 3) * 255).astype(np.uint8)}
        ds = StimuliDataset(stimuli, tfm)
        assert ds.native_batch([0]) is None
        loader = PrefetchLoader(ds, batch_size=1, shuffle=False, num_workers=1)
        (batch, keys), = list(loader)
        assert batch.shape == (1, 224, 224, 3)


class TestHdf5BatchRead:
    """Bulk-readable stimulus stores (LazyHdf5Dict.get_batch) feed the
    uint8 loader path with run-sliced h5py reads — must be bit-equal to
    the per-item path in the string-sorted key order both use."""

    @pytest.fixture(scope="class")
    def brick(self, tmp_path_factory):
        import h5py

        path = str(tmp_path_factory.mktemp("brick") / "b.hdf5")
        rng = np.random.RandomState(3)
        data = rng.randint(0, 256, (120, 256, 256, 3), dtype=np.uint8)
        with h5py.File(path, "w") as f:
            f.create_dataset("imgBrick", data=data)
        return path, data

    def test_matches_per_item(self, brick):
        from visreps_tpu.data.neural import LazyHdf5Dict

        path, data = brick
        stim = LazyHdf5Dict(path, "imgBrick", range(120))
        ds = StimuliDataset(stim, get_transform("imgnet", normalize=False))
        ds._cache = None
        idxs = list(range(64))
        out = ds.native_batch(idxs)
        assert out is not None
        batch, keys = out
        assert batch.dtype == np.uint8
        for j, i in enumerate(idxs):
            ref, k = ds[i]
            assert keys[j] == k
            np.testing.assert_array_equal(batch[j], ref)

    def test_scattered_runs(self, brick):
        """String-sorted int keys interleave digit groups — the
        run-sliced reader must reorder correctly."""
        from visreps_tpu.data.neural import LazyHdf5Dict

        path, data = brick
        stim = LazyHdf5Dict(path, "imgBrick", range(120))
        ds = StimuliDataset(stim, get_transform("imgnet", normalize=False))
        ds._cache = None
        # keys sorted as strings: '0','1','10','100',... — scattered
        assert [int(k) for k in ds.keys] != sorted(int(k) for k in ds.keys)
        batch, keys = ds.native_batch(list(range(len(ds))))
        for j in (0, 1, 2, 50, 119):
            np.testing.assert_array_equal(batch[j], data[int(keys[j])][16:240, 16:240])

    def test_float_feed_stays_per_item(self, brick):
        from visreps_tpu.data.neural import LazyHdf5Dict

        path, _ = brick
        stim = LazyHdf5Dict(path, "imgBrick", range(8))
        ds = StimuliDataset(stim, get_transform("imgnet", normalize=True))
        assert ds.native_batch(list(range(8))) is None


class TestDecodeCache:
    """Two-pass evals (THINGS/TVSD bulk + exact re-extraction) decode
    each JPEG once: StimuliDataset caches transformed outputs."""

    @pytest.mark.parametrize("normalize", [True, False])
    def test_second_pass_identical_and_cached(self, jpegs, normalize):
        tfm = get_transform("imgnet", normalize=normalize)
        stimuli = {f"s{i}": p for i, p in enumerate(jpegs)}
        ds = StimuliDataset(stimuli, tfm)
        assert ds._cache is not None
        loader = PrefetchLoader(ds, batch_size=2, shuffle=False, num_workers=2)
        p1 = [(b.copy(), k) for b, k in loader]
        assert len(ds._cache) == len(jpegs)
        p2 = [(b.copy(), k) for b, k in loader]
        for (b1, k1), (b2, k2) in zip(p1, p2):
            assert k1 == k2
            np.testing.assert_array_equal(b1, b2)

    def test_cap_disables(self, jpegs, monkeypatch):
        monkeypatch.setenv("VISREPS_DECODE_CACHE_MAX", "10")
        ds = StimuliDataset({"a": jpegs[0]}, get_transform("imgnet"))
        assert ds._cache is None

    def test_augment_disables(self, jpegs):
        ds = StimuliDataset({"a": jpegs[0]},
                            get_transform("imgnet", data_augment=True))
        assert ds._cache is None


class TestPngDecode:
    """PNG support (VERDICT item 9): NSD-Synthetic stimuli are PNGs."""

    @pytest.fixture(scope="class")
    def pngs(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("pngs")
        rng = np.random.RandomState(1)
        paths = []
        for i, (h, w) in enumerate([(400, 500), (300, 300), (250, 320)]):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            p = root / f"img{i}.png"
            Image.fromarray(img).save(p)
            paths.append(str(p))
        # non-RGB variants: grayscale and RGBA and palette
        gray = (rng.rand(280, 300) * 255).astype(np.uint8)
        p = root / "gray.png"
        Image.fromarray(gray, "L").save(p)
        paths.append(str(p))
        rgba = (rng.rand(280, 300, 4) * 255).astype(np.uint8)
        p = root / "rgba.png"
        Image.fromarray(rgba, "RGBA").save(p)
        paths.append(str(p))
        pal = Image.fromarray((rng.rand(260, 310, 3) * 255).astype(np.uint8)).convert(
            "P", palette=Image.ADAPTIVE)
        p = root / "palette.png"
        pal.save(p)
        paths.append(str(p))
        return paths

    def test_matches_pil_pipeline(self, pngs):
        tfm = get_transform("imgnet")
        out = native.decode_batch(pngs, 256, 224)
        for i, p in enumerate(pngs):
            ref = tfm(load_image(p))
            assert np.abs(out[i] - ref).mean() < 0.02, p
            assert np.abs(out[i] - ref).max() < 0.2, p

    def test_mixed_jpeg_png_batch(self, pngs, jpegs):
        mixed = [jpegs[0], pngs[0], jpegs[1], pngs[1]]
        out = native.decode_batch(mixed, 256, 224)
        tfm = get_transform("imgnet")
        for i, p in enumerate(mixed):
            assert np.abs(out[i] - tfm(load_image(p))).mean() < 0.02

    def test_stimuli_dataset_accepts_png(self, pngs):
        ds = StimuliDataset({f"s{i}": p for i, p in enumerate(pngs[:3])},
                            get_transform("imgnet"))
        res = ds.native_batch(list(range(3)))
        assert res is not None
        batch, keys = res
        assert batch.shape == (3, 224, 224, 3)
