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

    def test_corrupt_jpeg_raises_not_crashes(self, jpeg_files, tmp_path):
        """A truncated/garbage JPEG must surface as a decode-error count
        (the C++ setjmp libjpeg trap), never crash the worker thread."""
        paths, _ = jpeg_files
        bad = tmp_path / "bad.jpg"
        with open(paths[0], "rb") as f:
            data = f.read()
        bad.write_bytes(data[: len(data) // 3])       # truncated stream
        garbage = tmp_path / "garbage.jpg"
        garbage.write_bytes(b"\x00" * 256)            # not a JPEG at all
        loader = native_loader.NativeLoader(batch=2)
        loader.submit([str(bad), str(garbage)])
        if loader.available:
            with pytest.raises(IOError):
                loader.wait()
            # the loader stays usable after an error batch
            loader.submit([paths[0]])
            out = loader.wait()
            assert out.shape == (1, 224, 224, 3)


@pytest.mark.slow
class TestTrainerPrefetch:
    def test_each_batch_decoded_once(self, jpeg_files):
        """Default-on native prefetch: warm-up submits this batch and
        pre-samples the next; afterwards every step waits on the previous
        submit and submits exactly one new batch (no first-call double
        decode, trainer.py round-1 weakness #6)."""
        import tempfile

        import jax
        from hand_integral_pose_estimation_tpu.config import (
            Config, ModelConfig, TrainConfig,
        )
        from hand_integral_pose_estimation_tpu.data.freihand import (
            SampleRecord,
        )
        from hand_integral_pose_estimation_tpu.training import Trainer

        paths, _ = jpeg_files
        K = np.array([[531.9, 0, 112], [0, 532.2, 112], [0, 0, 1]],
                     np.float64)
        rng = np.random.RandomState(0)

        class FileDataset:
            def __init__(self):
                self.records = [
                    SampleRecord(
                        img_path=p, K=K,
                        joint_cam=(np.array([0, 0, 0.45])
                                   + rng.uniform(-0.03, 0.03, (21, 3))),
                        ref_bone_len=0.03, labelled=True, version="gs",
                        idx=i)
                    for i, p in enumerate(paths)]

            def __len__(self):
                return len(self.records)

            def sample_indices(self, r, bs, labelled_prob=None):
                return r.randint(0, len(self.records), bs)

        cfg = Config(
            model=ModelConfig(resnet_type=18, input_shape=(64, 64),
                              output_shape=(16, 16), depth_dim=8,
                              compute_dtype="float32"),
            train=TrainConfig(batch_size=4, lr=1e-3))
        t = Trainer(cfg=cfg, dataset=FileDataset(),
                    model_dir=tempfile.mkdtemp(), integral_impl="xla")
        assert t._loader is not None, "native prefetch should be default-on"

        submitted = []
        orig_submit = t._loader.submit
        t._loader.submit = lambda ps: (submitted.append(tuple(ps)),
                                       orig_submit(ps))[1]
        waits = []
        orig_wait = t._loader.wait
        t._loader.wait = lambda: (waits.append(1), orig_wait())[1]

        m = t.run_epoch(0, num_steps=3, log_every=100)
        assert np.isfinite(m["loss"])
        # 3 steps: warm-up submit + one submit per step; one wait per step
        assert len(submitted) == 4, submitted
        assert len(waits) == 3
        # the round-1 bug resubmitted the SAME paths immediately at warm-up
        assert submitted[0] != submitted[1]
