"""Native C++ IO loader: decode correctness vs cv2, batch prefetch API."""

import os
import tempfile

import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.data import native_loader

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def jpeg_files():
    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp()
    paths, images = [], []
    for i in range(6):
        # smooth images so JPEG loss is small
        yy, xx = np.mgrid[0:224, 0:224]
        img = np.stack([
            127 + 100 * np.sin(xx / (9.0 + i)),
            127 + 100 * np.cos(yy / 11.0),
            np.full_like(xx, 30 * i, dtype=float),
        ], axis=-1).astype(np.uint8)
        p = os.path.join(d, f"{i:08d}.jpg")
        cv2.imwrite(p, img[:, :, ::-1])  # store BGR like cv2 convention
        paths.append(p)
        images.append(img)
    return paths, images


class TestDecode:
    def test_single_decode_matches_cv2(self, jpeg_files):
        paths, _ = jpeg_files
        got = native_loader.decode_jpeg(paths[0])
        want = cv2.imread(paths[0])[:, :, ::-1]
        assert got.shape == (224, 224, 3)
        # libjpeg vs cv2's jpeg decoder: identical up to IDCT rounding
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 2

    def test_library_builds(self):
        assert native_loader.load_library() is not None, \
            "native libhipe_io.so failed to build"

    def test_batch_prefetch(self, jpeg_files):
        paths, _ = jpeg_files
        loader = native_loader.NativeLoader(batch=4)
        loader.submit(paths[:4])
        out = loader.wait()
        assert out.shape == (4, 224, 224, 3)
        for i in range(4):
            single = native_loader.decode_jpeg(paths[i])
            np.testing.assert_array_equal(out[i], single)

    def test_double_buffering_sequence(self, jpeg_files):
        paths, _ = jpeg_files
        loader = native_loader.NativeLoader(batch=3)
        loader.submit(paths[:3])
        a = loader.wait()
        loader.submit(paths[3:6])
        b = loader.wait()
        assert not np.array_equal(a, b)

    def test_missing_file_raises(self, jpeg_files):
        loader = native_loader.NativeLoader(batch=1)
        loader.submit(["/nonexistent/file.jpg"])
        if loader.available:
            with pytest.raises(IOError):
                loader.wait()
