"""Post-training int8 quantization (PTQ) for serving.

The reference has no quantized inference path; this is a TPU-first
capability extension: v5e's MXU executes s8 x s8 -> s32 matmuls/convs at
2x the bf16 peak (394 vs 197 TOP/s), and the serving-path ceiling
identified in PERFORMANCE.md is the conv stack itself (62 % conv
efficiency on the pose backbone, 29 % MFU on the detector backbone) — a
precision change is the one lever that moves a compute-bound conv
program without hand-written conv kernels.

Scheme (zero-point-free, TPU-friendly):
  * weights: symmetric per-output-channel int8,
    ``s_w[oc] = max|W[..., oc]| / 127`` — per-channel scales fold into
    the conv epilogue as a length-C_out multiply that XLA fuses;
  * activations: symmetric per-tensor int8 with static scales from a
    calibration pass (``s_x = max|x| / 127`` over calibration batches),
    baked into the program as constants — no dynamic requantization;
  * accumulation in int32 (``preferred_element_type``), dequantized once
    per layer by ``s_x * s_w`` and continued in the model's compute
    dtype, so BatchNorm/GroupNorm/ReLU run unchanged.

Implementation: flax method interception (`nn.intercept_methods`) swaps
every `nn.Conv` / `nn.ConvTranspose` / `nn.Dense` call for the int8
equivalent at trace time — models are untouched, so the same machinery
quantizes the pose net, the Faster R-CNN detector and the VGG backbone.
Modules with exotic settings (dilations, feature groups, circular
padding) fall back to the fp path silently and are listed in
``Quantized.skipped``.

Caveat (jit caching): interception must be active while the function is
*traced*. Wrap the traced body (`with quantized_calls(q): ...` inside
the jitted function, or `quantized_apply`) and do not reuse a jit cache
entry traced without it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_QUANT_TYPES = (nn.Conv, nn.ConvTranspose, nn.Dense)
_DN = ("NHWC", "HWIO", "NHWC")


def _path_str(module: nn.Module) -> str:
    return "/".join(module.path)


def _canon_strides(mod) -> Tuple[int, int]:
    s = getattr(mod, "strides", None) or 1
    return (s, s) if isinstance(s, int) else tuple(s)


def _canon_padding(mod):
    """flax Conv padding -> lax padding. Returns None when unsupported."""
    p = mod.padding
    if isinstance(p, str):
        return p if p in ("SAME", "VALID", "SAME_LOWER") else None
    if isinstance(p, int):
        return [(p, p)] * len(mod.kernel_size)
    try:
        out = []
        for e in p:
            out.append((e, e) if isinstance(e, int) else (e[0], e[1]))
        return out
    except TypeError:
        return None


def _is_simple(mod) -> bool:
    """True when the module's configuration maps 1:1 onto the int8 call."""
    if isinstance(mod, nn.Dense):
        return True
    if _canon_padding(mod) is None:
        return False

    def _unit(v):
        if v is None:
            return True
        if isinstance(v, int):
            return v == 1
        return all(e == 1 for e in v)

    if isinstance(mod, nn.ConvTranspose):
        return _unit(getattr(mod, "kernel_dilation", None))
    return (_unit(getattr(mod, "kernel_dilation", None))
            and _unit(getattr(mod, "input_dilation", None))
            and getattr(mod, "feature_group_count", 1) == 1)


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def calibrate(fn: Callable, *batches, jit: bool = True,
              root_type: Optional[type] = None) -> Dict[str, float]:
    """Record per-module input amax for every quantizable call inside `fn`.

    `fn(batch)` runs the model(s); the recorder taps each conv/dense input
    with `max|x|` and returns the tap dict as an extra traced output, so the
    whole calibration is ONE compiled program per batch shape (`jit=True`,
    important through the high-RPC-latency tunnel; `fn` itself must then be
    jit-free — an internal `jax.jit` would leak the taps across trace
    scopes). Returns {module_path: max|input|}, the running max across all
    `batches`.

    `root_type` restricts recording to modules rooted at that type — use it
    to calibrate one model at a time when `fn` traces several models with
    colliding relative paths (see Quantized.root_type).
    """

    def one(batch):
        rec: Dict[str, jnp.ndarray] = {}

        def recorder(next_fn, args, kwargs, context):
            mod = context.module
            if (isinstance(mod, _QUANT_TYPES)
                    and context.method_name == "__call__"
                    and _is_simple(mod)
                    and _root_matches(mod, root_type)):
                x = args[0] if args else kwargs.get("inputs")
                if x is not None:
                    key = _path_str(mod)
                    m = jnp.max(jnp.abs(x.astype(jnp.float32)))
                    rec[key] = jnp.maximum(rec[key], m) if key in rec else m
            return next_fn(*args, **kwargs)

        with nn.intercept_methods(recorder):
            fn(batch)
        return rec

    runner = jax.jit(one) if jit else one
    amax: Dict[str, float] = {}
    for b in batches:
        r = jax.device_get(runner(b))
        for k, v in r.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return amax


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Quantized:
    """Int8 weights + scales, keyed by flax module path ('a/b/Conv_0').

    `root_type`: when set, the replay interceptor only rewrites calls whose
    module tree is rooted at an instance of this type. Module paths are
    relative to their apply root, so two models in one traced program (the
    serving monolith runs ResPoseNet AND FasterRCNN — both with a
    'backbone/...' subtree of identical shapes) would otherwise collide and
    silently take each other's weights. `quantize_model` sets it; nest one
    `quantized_calls` per model."""

    kernels: Dict[str, jax.Array]       # int8, original kernel shape
    kscales: Dict[str, jax.Array]       # float32, (C_out,)
    ascales: Dict[str, float]           # per-tensor input scale
    biases: Dict[str, jax.Array]        # float32 (only for use_bias modules)
    skipped: Tuple[str, ...] = ()
    root_type: Optional[type] = None
    # fingerprint of the SOURCE params the kernels were quantized from
    # (shape + moment hash per path): replay takes kernels from the bundle,
    # not live params, so a persisted bundle silently pairing with a
    # different checkpoint would serve stale weights — verify_source_params
    # catches that loudly.
    params_digest: Optional[str] = None

    @property
    def paths(self) -> Tuple[str, ...]:
        return tuple(self.kernels)


def _lookup(tree, path: str):
    node = tree
    if path == "":          # module applied at the root: params ARE the leaf
        return node
    for part in path.split("/"):
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def digest_params(params, paths: Iterable[str]) -> str:
    """Order-independent fingerprint of the kernels at `paths`.

    Hashes each kernel's path, shape and two float64 moments (sum,
    abs-sum) — cheap, deterministic on host, and any checkpoint swap
    moves the moments. Used to pair a persisted `Quantized` bundle with
    the checkpoint it was built from (ADVICE r4: a stale --int8-db bundle
    must not silently ride a newer checkpoint)."""
    import hashlib

    import numpy as np

    h = hashlib.sha256()
    for p in sorted(paths):
        leaf = _lookup(params, p)
        if leaf is None or "kernel" not in leaf:
            h.update(("missing:" + p).encode())
            continue
        k = np.asarray(jax.device_get(leaf["kernel"]), np.float64)
        h.update(p.encode())
        h.update(str(k.shape).encode())
        h.update(np.float64(k.sum()).tobytes())
        h.update(np.float64(np.abs(k).sum()).tobytes())
    return h.hexdigest()[:16]


def verify_source_params(q: Quantized, params, what: str = "model") -> None:
    """Raise unless `params` are the params `q` was quantized from.

    No-op for legacy bundles without a digest (pre-round-5 .npz files)."""
    if q.params_digest is None:
        return
    live = digest_params(params, q.paths)
    if live != q.params_digest:
        raise ValueError(
            f"quantized bundle does not match the live {what} params "
            f"(bundle digest {q.params_digest}, live {live}): the bundle "
            f"was calibrated from a different checkpoint — rebuild it "
            f"(cli.evaluate --int8 without --int8-db, or quantize_model)")


def quantize_params(params, amax: Dict[str, float],
                    skip: Iterable[str] = ()) -> Quantized:
    """Per-output-channel int8 quantization of every calibrated module.

    `skip`: path prefixes to leave in fp (e.g. ("head/final",) keeps the
    heatmap projection full precision — its logits feed a softmax and the
    fused head consumes its params directly anyway).
    """
    skip = tuple(skip)
    kernels, kscales, ascales, biases = {}, {}, {}, {}
    skipped = []
    for path, a in sorted(amax.items()):
        leaf = _lookup(params, path)
        if leaf is None or "kernel" not in leaf:
            skipped.append(path)
            continue
        if any(path.startswith(s) for s in skip) or a == 0.0:
            skipped.append(path)
            continue
        w = jnp.asarray(leaf["kernel"], jnp.float32)
        red = tuple(range(w.ndim - 1))
        s = jnp.max(jnp.abs(w), axis=red) / 127.0
        s = jnp.maximum(s, 1e-12)
        kernels[path] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        kscales[path] = s
        ascales[path] = a / 127.0
        if "bias" in leaf:
            biases[path] = jnp.asarray(leaf["bias"], jnp.float32)
    return Quantized(kernels, kscales, ascales, biases, tuple(skipped),
                     params_digest=digest_params(params, kernels))


# ---------------------------------------------------------------------------
# Quantized execution
# ---------------------------------------------------------------------------


def _root_matches(mod: nn.Module, root_type: Optional[type]) -> bool:
    if root_type is None:
        return True
    cur = mod
    while isinstance(cur.parent, nn.Module):
        cur = cur.parent
    return type(cur) is root_type


def _quantize_act(x, scale: float):
    xf = x.astype(jnp.float32) * (1.0 / scale)
    return jnp.clip(jnp.round(xf), -127.0, 127.0).astype(jnp.int8)


def _run_quantized(mod, x, q: Quantized, path: str):
    xq = _quantize_act(x, q.ascales[path])
    wq = q.kernels[path]
    if isinstance(mod, nn.Dense):
        y = lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    elif isinstance(mod, nn.ConvTranspose):
        y = lax.conv_transpose(
            xq, wq, _canon_strides(mod), _canon_padding(mod),
            dimension_numbers=_DN, preferred_element_type=jnp.int32)
    else:
        y = lax.conv_general_dilated(
            xq, wq, _canon_strides(mod), _canon_padding(mod),
            dimension_numbers=_DN, preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (q.ascales[path] * q.kscales[path])
    if path in q.biases:
        out = out + q.biases[path]
    dtype = mod.dtype or x.dtype
    return out.astype(dtype)


def quantized_calls(q: Quantized):
    """Context manager: inside it, every flax conv/dense call whose module
    path is in `q` executes the int8 path. Active at TRACE time — wrap the
    traced body, and never share a jit cache entry with the fp path."""

    def replayer(next_fn, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, _QUANT_TYPES)
                and context.method_name == "__call__"):
            path = _path_str(mod)
            if path in q.kernels and _root_matches(mod, q.root_type):
                x = args[0] if args else kwargs.get("inputs")
                return _run_quantized(mod, x, q, path)
        return next_fn(*args, **kwargs)

    return nn.intercept_methods(replayer)


def quantized_apply(model: nn.Module, variables, q: Quantized, *args,
                    **kwargs):
    """`model.apply(variables, *args, **kwargs)` with int8 conv/dense."""
    with quantized_calls(q):
        return model.apply(variables, *args, **kwargs)


# ---------------------------------------------------------------------------
# Persistence — calibrate once, ship the bundle to serving
# ---------------------------------------------------------------------------


def save_quantized(path: str, q: Quantized) -> None:
    """Write a `Quantized` bundle to one .npz (int8 kernels, fp32 scales
    and biases, activation scales + skip list + root-type name as JSON
    metadata). `root_type` is a Python type and cannot round-trip — its
    NAME is stored and verified by `load_quantized(root_type=...)`."""
    import json

    import numpy as np

    arrs: Dict[str, Any] = {}
    for p, v in q.kernels.items():
        arrs["k//" + p] = np.asarray(v)
    for p, v in q.kscales.items():
        arrs["s//" + p] = np.asarray(v)
    for p, v in q.biases.items():
        arrs["b//" + p] = np.asarray(v)
    meta = {"ascales": q.ascales, "skipped": list(q.skipped),
            "root_type": q.root_type.__name__ if q.root_type else None,
            "params_digest": q.params_digest}
    arrs["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(path, **arrs)


def load_quantized(path: str, root_type: Optional[type] = None) -> Quantized:
    """Load a bundle saved by `save_quantized`. Pass the model class as
    `root_type` to re-arm the replay filter (raises if it does not match
    the saved name — loading the detector bundle into the pose net would
    otherwise silently replay the wrong weights)."""
    import json

    import numpy as np

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]))
        kernels, kscales, biases = {}, {}, {}
        for key in z.files:
            if key == "meta":
                continue
            kind, p = key.split("//", 1)
            arr = jnp.asarray(z[key])
            (kernels if kind == "k" else
             kscales if kind == "s" else biases)[p] = arr
    saved = meta["root_type"]
    if root_type is not None and saved not in (None, root_type.__name__):
        raise ValueError(
            f"quantized bundle {path} was built for root type {saved!r}, "
            f"not {root_type.__name__!r}")
    return Quantized(kernels, kscales, meta["ascales"], biases,
                     tuple(meta["skipped"]), root_type,
                     params_digest=meta.get("params_digest"))


# ---------------------------------------------------------------------------
# One-call convenience
# ---------------------------------------------------------------------------


def quantize_model(model: nn.Module, variables, calib_batches,
                   skip: Iterable[str] = (),
                   apply_kwargs: Optional[Dict[str, Any]] = None
                   ) -> Quantized:
    """Calibrate on `calib_batches` (iterable of model inputs) and quantize.

    `apply_kwargs` are forwarded to `model.apply` during calibration
    (e.g. {"train": False}). Returns the `Quantized` bundle for
    `quantized_apply` / `quantized_calls`.
    """
    kw = dict(apply_kwargs or {})
    amax = calibrate(lambda b: model.apply(variables, b, **kw),
                     *calib_batches)
    params = variables.get("params", variables)
    q = quantize_params(params, amax, skip=skip)
    return dataclasses.replace(q, root_type=type(model))
