"""The full semi-supervised recipe through the CLI layer: tiny teacher
snapshot -> tiny PANet -> student trained with the frozen teacher AND the
NRSfM prior in CombinedLoss (the reference's main workflow,
base.py:111-128 + main/train.py:83-99). Slow-gated: three train-step
compiles."""

import os

import pytest

from hand_integral_pose_estimation_tpu.models.panet import load_panet_params

run_slow = pytest.mark.skipif(
    os.environ.get("HIPE_RUN_SLOW", "") != "1",
    reason="set HIPE_RUN_SLOW=1 to run the semi-supervised CLI pipeline")


def test_load_panet_params_orbax_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from hand_integral_pose_estimation_tpu.models.panet import PANet

    model = PANet(pts_num=21)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 21, 3)))["params"]
    path = str(tmp_path / "panet_ckpt")
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), params)
    back = load_panet_params(path)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "freihand_mini")


@run_slow
@pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "training_K.json")),
    reason="freihand_mini fixture absent")
def test_filtered_db_pipeline_on_fixture(tmp_path):
    """generate_teacher_labels -> train --filtered-db on the real-format
    fixture: every record gets a db row (tail batch included) and training
    consumes the kept subset."""
    import numpy as np

    from hand_integral_pose_estimation_tpu.cli.generate_teacher_labels \
        import main as gen_main
    from hand_integral_pose_estimation_tpu.cli.train import main as train_main

    db = str(tmp_path / "filtered.npz")
    # batch 7 over 24 records forces a padded tail batch (24 % 7 != 0)
    gen_main(["--data-dir", FIXTURE, "--training-size", "6",
              "--batch-size", "7", "--out", db,
              "--variance-threshold", "1e9"])   # keep everything
    loaded = np.load(db)
    assert len(loaded["keep"]) == 24            # 6 x 4 versions, incl. tail
    assert loaded["keep"].all()
    assert len(loaded["name"]) == 24            # alignment identities
    train_main(["--data-dir", FIXTURE, "--training-size", "6",
                "--filtered-db", db, "--epochs", "1",
                "--steps-per-epoch", "1", "--batch-size", "4",
                "--pose-resnet", "18", "--pose-input", "64",
                "--model-dir", str(tmp_path / "m"),
                "--log-dir", str(tmp_path / "logs")])


@run_slow
@pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "training_K.json")),
    reason="freihand_mini fixture absent")
def test_cascade_cli_matches_single_pass(tmp_path):
    """--cascade through the CLI: same keep set and same kept pseudo-labels
    as the single-pass filter on the real-format fixture (same
    deterministic smoke-mode teacher), tail batch included."""
    import numpy as np

    from hand_integral_pose_estimation_tpu.cli.generate_teacher_labels \
        import main as gen_main

    common = ["--data-dir", FIXTURE, "--training-size", "6",
              "--batch-size", "7"]
    db1 = str(tmp_path / "single.npz")
    db2 = str(tmp_path / "cascade.npz")
    gen_main(common + ["--out", db1])
    gen_main(common + ["--out", db2, "--cascade", "--cascade-pass1", "5"])
    single, casc = np.load(db1), np.load(db2)
    assert len(casc["keep"]) == 24
    np.testing.assert_array_equal(casc["keep"], single["keep"])
    np.testing.assert_array_equal(casc["name"], single["name"])
    full = ~casc["early_rejected"]
    np.testing.assert_allclose(casc["variance"][full],
                               single["variance"][full],
                               rtol=1e-3, atol=1e-8)
    kept = single["keep"]
    np.testing.assert_allclose(casc["joint_cam_normalized"][kept],
                               single["joint_cam_normalized"][kept],
                               rtol=1e-4, atol=1e-6)
    # early-rejected rows: the stored lower bound never exceeds the truth
    er = casc["early_rejected"]
    assert np.all(casc["variance"][er]
                  <= single["variance"][er] * (1 + 1e-5))


@run_slow
def test_semi_supervised_pipeline(tmp_path):
    from hand_integral_pose_estimation_tpu.cli.train import (
        main as train_main,
    )
    from hand_integral_pose_estimation_tpu.cli.train_panet import (
        main as panet_main,
    )

    teacher_dir = str(tmp_path / "teacher")
    panet_dir = str(tmp_path / "panet")
    student_dir = str(tmp_path / "student")
    small = ["--synthetic", "--synthetic-size", "16", "--epochs", "1",
             "--batch-size", "4", "--pose-resnet", "18",
             "--pose-input", "64", "--log-dir", str(tmp_path / "logs")]

    train_main(small + ["--steps-per-epoch", "2",
                        "--model-dir", teacher_dir])
    panet_main(["--synthetic", "--steps", "10", "--batch-size", "16",
                "--out", panet_dir])
    train_main(small + ["--steps-per-epoch", "2",
                        "--model-dir", student_dir,
                        "--teacher-ckpt", teacher_dir,
                        "--panet-ckpt", os.path.join(panet_dir,
                                                     "model_best"),
                        "--lam", "0.1"])
    assert os.path.exists(os.path.join(student_dir, "snapshot_0"))


def test_study_subset_view():
    """subset_view: per-sample arrays sliced consistently, labelled mask
    override, counts recomputed."""
    import numpy as np

    from hand_integral_pose_estimation_tpu.cli.semi_supervised_study import (
        subset_view,
    )
    from hand_integral_pose_estimation_tpu.data.freihand import (
        SyntheticFreiHand,
    )

    ds = SyntheticFreiHand(n=12, image_hw=(32, 32), seed=5)
    idx = np.asarray([1, 3, 5, 7])
    sub = subset_view(ds, idx, np.asarray([True, False, True, False]))
    assert sub.n == 4 and len(sub) == 4
    assert sub.num_labelled == 2 and sub.num_unlabelled == 2
    np.testing.assert_array_equal(sub.images, ds.images[idx])
    np.testing.assert_array_equal(sub.joint_cam, ds.joint_cam[idx])
    np.testing.assert_array_equal(sub.ref_bone_len, ds.ref_bone_len[idx])
    b = sub.host_batch(np.asarray([0, 2]))
    np.testing.assert_array_equal(b["image"], ds.images[[1, 5]])
    assert b["labelled"].tolist() == [True, True]
    # original untouched
    assert ds.n == 12 and ds.images.shape[0] == 12


@run_slow
def test_filter_cascade_study_tiny_end_to_end():
    """The cascade-survival study runs end-to-end at toy scale: trains a
    tiny teacher, filters a pool twice (single-pass vs cascade), asserts
    keep-set equality internally, and reports survival + wall numbers."""
    from hand_integral_pose_estimation_tpu.cli.filter_cascade_study import (
        main,
    )

    rec = main(["--n", "8", "--pool", "16", "--teacher-steps", "2",
                "--batch-size", "4", "--pose-resnet", "18",
                "--pose-input", "32", "--cascade-pass1", "5"])
    assert rec["keep_sets_equal"] is True
    assert 0.0 <= rec["pass1_survival"] <= 1.0
    assert 0.0 <= rec["keep_rate"] <= 1.0
    assert rec["wall_single_s"] > 0 and rec["wall_cascade_s"] > 0


@run_slow
def test_study_tiny_end_to_end(tmp_path):
    """The three-arm study runs end-to-end at toy scale and reports the
    summary record (numbers are meaningless at these step counts — this
    drives the mechanics: teacher fit/snapshot, make_frozen_teacher,
    per-arm Tester/evaluate)."""
    from hand_integral_pose_estimation_tpu.cli.semi_supervised_study import (
        main,
    )

    results = main(["--n", "12", "--labelled", "4", "--test-n", "6",
                    "--teacher-steps", "2", "--student-steps", "2",
                    "--batch-size", "4", "--pose-resnet", "18",
                    "--pose-input", "32"])
    assert set(results) == {"teacher", "baseline", "distilled"}
    for rec in results.values():
        assert rec["mpjpe"] > 0 and rec["pa_mpjpe"] > 0
