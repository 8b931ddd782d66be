"""YUV 4:2:0 transport path: native raw decode + device-side finish.

Gates the round-5 H2D-halving structure (native/hipe_io.cpp
`decode_jpeg_file_yuv420` + ops/yuv.py) bitwise against the full-host RGB
decode everything else in the framework was validated against — the claim
is not "close", it is byte-for-byte the same pixels with half the
host->device bytes. Reference's loader counterpart: cv2.imread in
data/dataset.py:109 (the reference has no subsampled transport at all).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hand_integral_pose_estimation_tpu.data.native_loader import (  # noqa: E402
    NativeLoader,
    decode_jpeg,
    decode_jpeg_yuv420,
    load_library,
)
from hand_integral_pose_estimation_tpu.ops.yuv import (  # noqa: E402
    planar_sizes,
    upsample_h2v2_fancy,
    ycc_to_rgb,
    yuv420_to_rgb,
)

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native libhipe_io.so failed to build")


def _write_jpeg(path, h, w, seed=0, quality=95, sampling=None):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.uint8)
    for _ in range(14):
        x, y = int(rng.randint(0, w)), int(rng.randint(0, h))
        cv2.circle(img, (x, y), int(rng.randint(5, max(6, min(h, w) // 5))),
                   rng.randint(0, 255, 3).tolist(), -1)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    flags = [cv2.IMWRITE_JPEG_QUALITY, quality]
    if sampling is not None:
        flags += [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sampling]
    assert cv2.imwrite(str(path), img, flags)
    return str(path)


class TestYuvDecodeBitwise:
    def test_aligned_224_matches_rgb_decode_bitwise(self, tmp_path):
        """224x224 (16-aligned): the direct-into-output fast path."""
        p = _write_jpeg(tmp_path / "a.jpg", 224, 224, seed=1)
        rgb = decode_jpeg(p, 224, 224)
        packed = decode_jpeg_yuv420(p, 224, 224)
        assert packed.shape == (224 * 224 * 3 // 2,)
        dev = np.asarray(yuv420_to_rgb(packed[None], 224, 224))[0]
        np.testing.assert_array_equal(dev, rgb)

    @pytest.mark.parametrize("hw", [(200, 200), (226, 150), (120, 88)])
    def test_unaligned_sizes_match_bitwise(self, tmp_path, hw):
        """Non-16-aligned sizes exercise the padded staging + crop path."""
        h, w = hw
        p = _write_jpeg(tmp_path / "u.jpg", h, w, seed=2)
        rgb = decode_jpeg(p, h, w)
        packed = decode_jpeg_yuv420(p, h, w)
        dev = np.asarray(yuv420_to_rgb(packed[None], h, w))[0]
        np.testing.assert_array_equal(dev, rgb)

    def test_rejects_non_420_and_wrong_size(self, tmp_path):
        p444 = _write_jpeg(tmp_path / "s444.jpg", 224, 224,
                           sampling=cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444)
        with pytest.raises(IOError, match="-3"):
            decode_jpeg_yuv420(p444, 224, 224)
        p = _write_jpeg(tmp_path / "a.jpg", 224, 224)
        with pytest.raises(IOError, match="-3"):
            decode_jpeg_yuv420(p, 112, 112)   # no resize in YUV mode

    def test_planar_sizes_odd_dims_raise(self):
        with pytest.raises(ValueError):
            planar_sizes(223, 224)


class TestYuvOps:
    def test_upsample_matches_scalar_libjpeg_reference(self):
        """Vectorized upsample == a literal transcription of jdsample.c."""
        rng = np.random.RandomState(3)
        c = rng.randint(0, 256, (2, 5, 7), np.uint8)
        got = np.asarray(upsample_h2v2_fancy(c))

        def scalar(cp):
            ch, cw = cp.shape
            out = np.zeros((2 * ch, 2 * cw), np.int64)
            for r in range(2 * ch):
                i = r // 2
                f = max(i - 1, 0) if r % 2 == 0 else min(i + 1, ch - 1)
                colsum = 3 * cp[i].astype(np.int64) + cp[f]
                for j in range(cw):
                    left = colsum[max(j - 1, 0)]
                    right = colsum[min(j + 1, cw - 1)]
                    out[r, 2 * j] = (3 * colsum[j] + left + 8) >> 4
                    out[r, 2 * j + 1] = (3 * colsum[j] + right + 7) >> 4
            return out.astype(np.uint8)

        for b in range(c.shape[0]):
            np.testing.assert_array_equal(got[b], scalar(c[b]))

    def test_ycc_identity_grey(self):
        """Neutral chroma (128) must reproduce Y exactly on all 256 levels."""
        y = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
        n = np.full_like(y, 128)
        rgb = np.asarray(ycc_to_rgb(y, n, n))
        for ch in range(3):
            np.testing.assert_array_equal(rgb[..., ch], y)


class TestYuvLoader:
    def test_batch_loader_yuv_roundtrip(self, tmp_path):
        paths = [_write_jpeg(tmp_path / ("%d.jpg" % i), 224, 224, seed=i)
                 for i in range(4)]
        loader = NativeLoader(4, 224, 224, num_threads=2, layout="yuv420")
        loader.submit(paths)
        packed = loader.wait()
        assert packed.shape == (4, 224 * 224 * 3 // 2)
        dev = np.asarray(yuv420_to_rgb(packed, 224, 224))
        for i, p in enumerate(paths):
            np.testing.assert_array_equal(dev[i], decode_jpeg(p, 224, 224))

    def test_batch_loader_yuv_flags_bad_file(self, tmp_path):
        good = _write_jpeg(tmp_path / "g.jpg", 224, 224)
        bad = _write_jpeg(tmp_path / "b.jpg", 100, 100)   # size mismatch
        loader = NativeLoader(2, 224, 224, num_threads=1, layout="yuv420")
        loader.submit([good, bad])
        with pytest.raises(IOError, match="decode errors"):
            loader.wait()
