import os
import tempfile

import numpy as np
import pytest

from kornia_tpu.io.native import (NativeBatchLoader, native_available,
                                  read_batch_native, read_image_native,
                                  write_image_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native io backend not built")


class TestNativeIO:
    def test_png_roundtrip(self):
        with tempfile.TemporaryDirectory() as d:
            img = (np.random.default_rng(0).random((32, 24, 3)) * 255
                   ).astype(np.uint8)
            p = os.path.join(d, "a.png")
            write_image_native(p, img)
            np.testing.assert_array_equal(read_image_native(p), img)

    def test_jpeg_roundtrip_smooth(self):
        with tempfile.TemporaryDirectory() as d:
            # smooth gradient: JPEG-friendly content
            ys = np.linspace(0, 255, 64)[:, None]
            xs = np.linspace(0, 255, 48)[None, :]
            img = np.stack([ys + 0 * xs, 0 * ys + xs, (ys + xs) / 2],
                           -1).astype(np.uint8)
            p = os.path.join(d, "a.jpg")
            write_image_native(p, img, quality=95)
            back = read_image_native(p)
            assert np.abs(back.astype(int) - img.astype(int)).mean() < 3

    def test_batch_resize(self):
        with tempfile.TemporaryDirectory() as d:
            paths = []
            for i in range(8):
                p = os.path.join(d, f"{i}.png")
                write_image_native(p, (np.random.default_rng(i).random(
                    (40 + i, 30, 3)) * 255).astype(np.uint8))
                paths.append(p)
            batch = read_batch_native(paths, (32, 32))
            assert batch.shape == (8, 32, 32, 3)

    def test_batch_loader(self):
        with tempfile.TemporaryDirectory() as d:
            paths = []
            for i in range(4):
                p = os.path.join(d, f"{i}.png")
                write_image_native(p, (np.random.default_rng(i).random(
                    (16, 16, 3)) * 255).astype(np.uint8))
                paths.append(p)
            loader = NativeBatchLoader([paths[:2], paths[2:]], (16, 16))
            batches = list(loader)
            assert len(batches) == 2
            assert batches[0].shape == (2, 16, 16, 3)

    def test_missing_file(self):
        with pytest.raises(IOError):
            read_image_native("/nonexistent/file.png")

    def test_load_image_uses_native(self):
        from kornia_tpu.io import ImageLoadType, load_image
        with tempfile.TemporaryDirectory() as d:
            img = (np.random.default_rng(0).random((16, 16, 3)) * 255
                   ).astype(np.uint8)
            p = os.path.join(d, "a.png")
            write_image_native(p, img)
            out = load_image(p, ImageLoadType.RGB32)
            assert out.shape == (3, 16, 16)
            np.testing.assert_allclose(
                np.asarray(out), img.transpose(2, 0, 1) / 255.0, atol=1e-6)
