"""Shared `--mesh` argument handling for the CLIs.

One grammar everywhere: 'auto' | 'none' | 'data=N[,model=M]'. Training
(cli/train.py) resolves 'auto' through the Trainer's process-aware
auto-mesh; evaluation/serving CLIs resolve it here (single-process sweeps:
data-parallel over the largest device prefix whose size divides the batch).
Bad specs exit with an attributable message (SystemExit, CLI semantics).
"""

from __future__ import annotations

from typing import Optional


def parse_explicit_mesh(arg: str):
    """'data=N[,model=M]' (either axis alone infers the other from the
    visible device count) -> (mesh, model_parallelism). Raises SystemExit
    on a malformed spec or one that exceeds the visible devices."""
    import jax

    from hand_integral_pose_estimation_tpu.parallel import make_mesh

    spec = {}
    for kv in arg.split(","):
        key, eq, val = kv.partition("=")
        if not eq or key not in ("data", "model") \
                or not val.isdigit() or int(val) < 1:
            raise SystemExit(
                f"--mesh {arg!r}: expected 'auto', 'none', or "
                f"'data=N[,model=M]' (bad token {kv!r})")
        spec[key] = int(val)
    n_dev = len(jax.devices())
    model_par = spec.get("model", 1)
    data_n = spec.get("data", n_dev // model_par)
    if data_n < 1:
        raise SystemExit(
            f"--mesh {arg}: model={model_par} leaves no devices "
            f"for the data axis ({n_dev} visible)")
    if data_n * model_par > n_dev:
        raise SystemExit(
            f"--mesh {arg} needs {data_n * model_par} devices, "
            f"{n_dev} visible")
    mesh = make_mesh(model_parallelism=model_par,
                     devices=jax.devices()[:data_n * model_par])
    return mesh, model_par


def resolve_eval_mesh(arg: str, batch_size: int,
                      log=print) -> Optional[object]:
    """`--mesh` for evaluation/serving CLIs -> Mesh or None.

    'auto': data-parallel over the largest device prefix whose size divides
    `batch_size` (None when that is one device — nothing to shard over).
    'none'/'1': single device. Explicit 'data=N[,model=M]': the batch must
    divide the data axis (SystemExit otherwise, matching Tester.run's
    ValueError but failing at argument time)."""
    if arg in ("none", "1"):
        return None
    import jax

    from hand_integral_pose_estimation_tpu.parallel import make_mesh

    if arg == "auto":
        n_dev = len(jax.devices())
        if n_dev <= 1:
            return None
        data_n = next(d for d in range(min(n_dev, batch_size), 0, -1)
                      if batch_size % d == 0)
        if data_n <= 1:
            return None
        mesh = make_mesh(devices=jax.devices()[:data_n])
        log(f"eval mesh: data-parallel over {data_n} devices")
        return mesh
    mesh, _ = parse_explicit_mesh(arg)
    if batch_size % mesh.shape["data"]:
        raise SystemExit(
            f"--mesh {arg}: batch size {batch_size} must divide by the "
            f"data-axis size {mesh.shape['data']}")
    return mesh
