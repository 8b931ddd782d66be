"""PANet — NRSfM hierarchical block-sparse-coding autoencoder.

Capability equivalent of the reference's procrustes_encoding subsystem
(nrsfm/nrsfmnet.py, nrsfm/nrsfm_modules.py): a camera-equivariant sparse
encoder stack, an SVD-orthonormalised camera estimator (learned Procrustes),
a pose-code calibration layer, and a mirrored decoder producing
`pts_recon = canonical @ camera`.

TPU-first re-design: the reference implements every layer as torch
conv(-transpose)2d tricks over 1x1/3x3 "images" and orthonormalises through a
custom CUDA batched-SVD extension (nrsfm/batch_svd.py). Here each layer is a
plain einsum (all MXU) and the camera SVD is `jnp.linalg.svd` under vmap —
differentiable, no custom kernels needed.

Operator correspondence (verified numerically against the shipped
`logs/hand_pa/model_best.pth` in tests/test_panet.py):
  * SfM encode (nrsfm_modules.py:99-110): conv_transpose2d with the
    (P, 3, D) dictionary == einsum('pid,bpj->bdij') producing the (B, D, 3, 3)
    camera-equivariant block code;
  * Block encode (:158-167): 1x1 conv_transpose == einsum('co,bcij->boij');
  * relu threshold (:10-11): relu(x + bias[channel]);
  * camera estimator (:186-193): 1x1 conv to (B, 3, 3) + SVD orthonormalise
    with the det-sign reflection fix (:46-67);
  * code estimator (:196-208): full 3x3 conv == einsum('bcij,ocij->bo');
  * block decode (:169-182): 1x1 conv + relu threshold;
  * SfM decode (:112-123): linear map with bias, no relu, to (B, P, 3).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import he_uniform, zeros


def _fan_in_uniform(fan_in: int):
    """Kaiming-uniform-style init for arbitrary-rank params (the torch
    default conv init used by the reference's camera/code layers)."""
    import math
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


DEFAULT_DICT_SIZES: Tuple[int, ...] = (512, 256, 128, 64, 32, 16, 8)


def block_soft_threshold(x: jnp.ndarray, thrsh: jnp.ndarray) -> jnp.ndarray:
    """Group-sparse shrinkage over each (3, 3) code block
    (nrsfm_modules.py:13-22): scale each block by
    relu(1 - thrsh / ||block||_2). The norm is clamped away from zero so a
    zero block maps to zero instead of 0 * inf = nan (the torch version hits
    that edge only on exactly-zero blocks)."""
    norm = jnp.linalg.norm(
        x.reshape(*x.shape[:2], -1), axis=-1)            # (B, D)
    scale = nn.relu(1.0 - thrsh[None, :] / jnp.maximum(norm, 1e-12))
    return scale[..., None, None] * x


def relu_threshold(x: jnp.ndarray, thrsh: jnp.ndarray) -> jnp.ndarray:
    """Channel-biased relu (nrsfm_modules.py:10-11)."""
    return nn.relu(x + thrsh[None, :, None, None])


def make_orthonormal(mats: jnp.ndarray) -> jnp.ndarray:
    """Closest-rotation projection via SVD with reflection fix
    (nrsfm_modules.py:46-67): orth = U V^T; if det < 0, flip the last column
    of U. Batched natively by jnp.linalg.svd."""
    U, _, Vh = jnp.linalg.svd(mats, full_matrices=False)
    orth = U @ Vh
    det = jnp.linalg.det(orth)
    sign = jnp.sign(det)[..., None]
    U = U.at[..., :, -1].multiply(sign)
    return U @ Vh


class PANet(nn.Module):
    """pts (B, P, 3) -> (pts_recon, pts_recon_canonical, camera, code).

    Matches reference PANet.forward (nrsfmnet.py:51-72).
    """

    pts_num: int = 21
    dict_sizes: Sequence[int] = DEFAULT_DICT_SIZES
    #: encoder threshold choice (nrsfm_modules.py:92-95,143-146): True ->
    #: relu_threshold, False -> block_soft_threshold. The decoder always uses
    #: relu (ae_thresh_func, nrsfm_modules.py:148).
    encode_with_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts_3d: jnp.ndarray):
        ds = list(self.dict_sizes)
        P = self.pts_num
        x = pts_3d.astype(self.dtype)
        thresh = relu_threshold if self.encode_with_relu else \
            block_soft_threshold

        # ---- encoder ----
        dict0 = self.param("dict0", he_uniform(), (P, 3, ds[0]), self.dtype)
        b_enc0 = self.param("bias_enc0", zeros, (ds[0],), self.dtype)
        # (B, P, 3) x (P, 3, D) -> (B, D, 3, 3) camera-equivariant block code
        code = jnp.einsum("pid,bpj->bdij", dict0, x)
        code = thresh(code, b_enc0)

        dicts = []
        for li in range(1, len(ds)):
            w = self.param(f"dict{li}", he_uniform(), (ds[li - 1], ds[li]),
                           self.dtype)
            b = self.param(f"bias_enc{li}", zeros, (ds[li],), self.dtype)
            dicts.append(w)
            code = jnp.einsum("co,bcij->boij", w, code)
            code = thresh(code, b)

        # ---- camera + pose code ----
        cam_w = self.param("camera_w", _fan_in_uniform(ds[-1]),
                           (ds[-1],), self.dtype)
        camera = make_orthonormal(jnp.einsum("c,bcij->bij", cam_w, code))

        code_w = self.param("code_w", _fan_in_uniform(ds[-1] * 9),
                            (ds[-1], ds[-1], 3, 3), self.dtype)
        bottleneck = jnp.einsum("bcij,ocij->bo", code, code_w)
        z = bottleneck

        # ---- decoder (shared dictionaries, mirrored) ----
        for li in range(len(ds) - 1, 0, -1):
            b_dec = self.param(f"bias_dec{li}", zeros, (ds[li - 1],),
                               self.dtype)
            z = jnp.einsum("bo,co->bc", z, dicts[li - 1])
            z = nn.relu(z + b_dec)

        b_dec0 = self.param("bias_dec0", zeros, (P * 3,), self.dtype)
        recon = jnp.einsum("bd,pid->bpi", z,
                           dict0) + b_dec0.reshape(P, 3)
        pts_recon = recon @ camera
        return pts_recon, recon, camera, bottleneck


def panet_reconstruction_fn(model: PANet, params) -> callable:
    """(B, P, 3) centred points -> (B, P, 3) reconstruction — the callable
    CombinedLoss consumes (PANet_reconstruction.py:58-62)."""
    def apply(pts):
        pts_recon, _, _, _ = model.apply({"params": params}, pts)
        return pts_recon
    return apply


def frobenius_norm_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-sample flattened L2 norm, batch mean (train.py:14-17)."""
    d = (a - b).reshape(a.shape[0], -1)
    return jnp.linalg.norm(d, axis=-1).mean()


def panet_loss(model: PANet, params, pts_3d: jnp.ndarray,
               sparsity_weight: float = 1e-4):
    """NRSfM_learner loss (train.py:83-104): Frobenius recon + L1 code
    sparsity. Returns (loss, metrics)."""
    pts_recon, _, _, code = model.apply({"params": params}, pts_3d)
    loss_recon = frobenius_norm_loss(pts_recon, pts_3d)
    # reference: code has shape (B, D, 1, 1) and `.abs().sum(-1).mean()`
    # sums a size-1 axis, so the term is mean(|code|) (train.py:85)
    loss_sparsity = jnp.abs(code).mean()
    loss = loss_recon + sparsity_weight * loss_sparsity
    mpjpe = jnp.linalg.norm(pts_recon - pts_3d, axis=-1).mean()
    return loss, {"loss": loss, "loss_recon": loss_recon,
                  "loss_sparsity": loss_sparsity, "mpjpe": mpjpe}


def panet_loss_per_sample(model: PANet, params,
                          pts_3d: jnp.ndarray) -> jnp.ndarray:
    """Per-sample Frobenius reconstruction loss (the quantity
    predict_batch_main returns for hard-example mining,
    train_kernel.py:470-479)."""
    pts_recon, _, _, _ = model.apply({"params": params}, pts_3d)
    d = (pts_recon - pts_3d).reshape(pts_3d.shape[0], -1)
    return jnp.linalg.norm(d, axis=-1)


def convert_torch_state_dict(state_dict) -> dict:
    """Shipped torch checkpoint (logs/hand_pa/model_best.pth) -> our params.

    Mapping:
      sparse_coding_layers.0.dictionary (P, 3, D)        -> dict0
      sparse_coding_layers.0.bias_encode_with_cam (D,)   -> bias_enc0
      sparse_coding_layers.0.bias_decode (P*3,)          -> bias_dec0
      sparse_coding_layers.i.dictionary (Cin, Cout, 1, 1)-> dict{i} (Cin,Cout)
      sparse_coding_layers.i.bias_*                      -> bias_enc{i}/dec{i}
      camera_estimator.linear_comb_layer.weight (1,C,1,1)-> camera_w (C,)
      code_estimator.fc_layer.weight (O,C,3,3)           -> code_w
    """
    import numpy as np

    def arr(k):
        v = state_dict[k]
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    params = {}
    i = 0
    while f"sparse_coding_layers.{i}.dictionary" in state_dict:
        d = arr(f"sparse_coding_layers.{i}.dictionary")
        if i == 0:
            params["dict0"] = d
        else:
            params[f"dict{i}"] = d.reshape(d.shape[0], d.shape[1])
        params[f"bias_enc{i}"] = arr(
            f"sparse_coding_layers.{i}.bias_encode_with_cam")
        params[f"bias_dec{i}"] = arr(
            f"sparse_coding_layers.{i}.bias_decode")
        i += 1
    params["camera_w"] = arr(
        "camera_estimator.linear_comb_layer.weight").reshape(-1)
    params["code_w"] = arr("code_estimator.fc_layer.weight")
    return params


def load_panet_params(ckpt_path: str) -> dict:
    """PANet params from either a shipped torch checkpoint (*.pth, via
    convert_torch_state_dict) or an orbax dir written by cli/train_panet.py
    — the single loader behind `load_nrsfm_tester` (base.py:111-115)."""
    import os

    if ckpt_path.endswith(".pth"):
        import torch
        return convert_torch_state_dict(
            torch.load(ckpt_path, map_location="cpu", weights_only=True))
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
