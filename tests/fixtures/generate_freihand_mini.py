"""Generate the committed mini real-format FreiHAND fixture.

Writes tests/fixtures/freihand_mini/ with the exact on-disk layout
FreiHandDataset._load / _load_evaluation consume (FreiHand.py:214-239,
286-341): training_{K,xyz,scale}.json, training/rgb/{file_id:08d}.jpg for
every version (file_id = idx + 32560 * version_index, FreiHand.py:164-166),
and evaluation_{K,scale}.json + evaluation/rgb. Deterministic; run once and
commit the output:

    python tests/fixtures/generate_freihand_mini.py
"""

import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "freihand_mini")
DB_SIZE = 32560               # FreiHand.py:173 — file-id version stride
N_TRAIN_ANN = 8               # annotation entries (>= test-split end)
TRAIN_IDS = list(range(6)) + [7]   # training_size=6 split + test idx 7
N_EVAL = 3
HW = 224


def hand_sample(rng):
    K = np.array([[531.9 + rng.randn(), 0.0, 112.0 + rng.randn()],
                  [0.0, 532.2 + rng.randn(), 112.0 + rng.randn()],
                  [0.0, 0.0, 1.0]])
    center = np.array([0.01, -0.005, 0.47]) + rng.uniform(-0.02, 0.02, 3)
    joints = center + rng.uniform(-0.04, 0.04, (21, 3))
    scale = float(np.linalg.norm(joints[9] - joints[10]))
    return K, joints, scale


def render(K, joints, rng):
    """224x224 RGB with a blob at each projected joint (visual structure for
    the crop pipeline; matches SyntheticFreiHand's render_joints idea)."""
    img = rng.randint(0, 63, (HW, HW, 3)).astype(np.uint8)
    uvw = joints @ K.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    for j in range(21):
        x, y = int(round(uv[j, 0])), int(round(uv[j, 1]))
        if 2 <= x < HW - 2 and 2 <= y < HW - 2:
            col = np.array([255 * (j % 3 == 0), 255 * (j % 3 == 1),
                            255 * (j % 3 == 2)], np.uint8)
            img[y - 2:y + 3, x - 2:x + 3] = col
    return img


def main():
    import cv2
    rng = np.random.RandomState(20260816)
    os.makedirs(os.path.join(OUT, "training", "rgb"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "evaluation", "rgb"), exist_ok=True)

    Ks, xyzs, scales = [], [], []
    for _ in range(N_TRAIN_ANN):
        K, joints, scale = hand_sample(rng)
        Ks.append(K.tolist())
        xyzs.append(joints.tolist())
        scales.append(scale)
    with open(os.path.join(OUT, "training_K.json"), "w") as f:
        json.dump(Ks, f)
    with open(os.path.join(OUT, "training_xyz.json"), "w") as f:
        json.dump(xyzs, f)
    with open(os.path.join(OUT, "training_scale.json"), "w") as f:
        json.dump(scales, f)
    # mano rows: (1, 61) pose+shape+trans, the real files' nesting.
    # Separate rng so adding this file did not shift the image stream of
    # the committed fixture.
    mrng = np.random.RandomState(61)
    manos = [mrng.uniform(-1, 1, (1, 61)).tolist()
             for _ in range(N_TRAIN_ANN)]
    with open(os.path.join(OUT, "training_mano.json"), "w") as f:
        json.dump(manos, f)

    for idx in TRAIN_IDS:
        base = render(np.asarray(Ks[idx]), np.asarray(xyzs[idx]), rng)
        for v in range(4):        # gs/hom/sample/auto versions
            img = base.copy()
            img[:8, :8] = 32 * v  # tiny version marker
            file_id = idx + DB_SIZE * v
            cv2.imwrite(os.path.join(OUT, "training", "rgb",
                                     f"{file_id:08d}.jpg"),
                        img[:, :, ::-1])

    eK, eS = [], []
    for idx in range(N_EVAL):
        K, joints, scale = hand_sample(rng)
        eK.append(K.tolist())
        eS.append(scale)
        cv2.imwrite(os.path.join(OUT, "evaluation", "rgb",
                                 f"{idx:08d}.jpg"),
                    render(K, joints, rng)[:, :, ::-1])
    with open(os.path.join(OUT, "evaluation_K.json"), "w") as f:
        json.dump(eK, f)
    with open(os.path.join(OUT, "evaluation_scale.json"), "w") as f:
        json.dump(eS, f)
    n_imgs = sum(len(files) for _, _, files in os.walk(OUT))
    print(f"fixture written to {OUT} ({n_imgs} files)")


if __name__ == "__main__":
    main()
