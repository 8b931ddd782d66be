"""Trainer / Tester runners (equivalent of common/base.py:33-284 +
main/train.py:34-163's loop), TPU-style: host feeds raw batches, one jitted
program does preprocess + forward + loss + update.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hand_integral_pose_estimation_tpu.config import Config
from hand_integral_pose_estimation_tpu.data import pipeline
from hand_integral_pose_estimation_tpu.models.pose_net import get_pose_net
from hand_integral_pose_estimation_tpu.training import checkpoint as ckpt
from hand_integral_pose_estimation_tpu.training.state import (
    TrainState,
    create_train_state,
    make_optimizer,
)
from hand_integral_pose_estimation_tpu.training.train_step import (
    make_eval_step,
    make_train_step,
)
from hand_integral_pose_estimation_tpu.utils.logger import color_logger
from hand_integral_pose_estimation_tpu.utils.metrics_writer import (
    MetricsWriter,
)
from hand_integral_pose_estimation_tpu.utils.timers import Timer


@dataclasses.dataclass
class Trainer:
    """End-to-end training runner.

    Equivalent responsibilities to the reference Trainer (common/base.py:90-177):
    build the model + optimiser, optionally load PANet and a frozen teacher,
    resume from the latest snapshot, and run the per-iteration loop with
    read/step timing. The per-sample cv2 DataLoader worker pool is replaced by
    the on-device pipeline (the `read` timer here measures only host batch
    assembly + JPEG decode).
    """

    cfg: Config
    dataset: object                        # FreiHandDataset / SyntheticFreiHand
    model_dir: str = "/tmp/hipe_model_dump"
    log_dir: Optional[str] = None
    panet_apply: Optional[Callable] = None
    teacher_apply: Optional[Callable] = None
    integral_impl: str = "auto"
    continue_train: bool = False
    seed: int = 0
    #: fuse this many optimisation steps into one device program (lax.scan):
    #: hides host round-trip latency and dispatch overhead
    scan_steps: int = 1
    #: decode JPEG batches with the C++ prefetch loader (native/hipe_io.cpp),
    #: overlapping the next batch's decode with the current device step;
    #: only takes effect for file-backed datasets (default ON — the input
    #: pipeline was the reference's bottleneck, SURVEY.md §5)
    native_prefetch: bool = True
    #: ship decoded batches to the device as the JPEG's own subsampled
    #: 4:2:0 planes (1.5 B/px instead of 3) and finish the decode inside
    #: the jitted step (ops/yuv.py — BITWISE equal pixels, so the loss
    #: trajectory is identical to the RGB path; tests/test_yuv.py). Wins
    #: whenever host->device bandwidth is the input bound; requires
    #: native_prefetch, a file-backed dataset, and (H, W) 4:2:0 JPEGs.
    yuv_transport: bool = False
    metrics_dir: Optional[str] = None
    #: write a jax.profiler trace of the first few steps of the first epoch
    profile_dir: Optional[str] = None
    #: test-split dataset for the epoch-end loss sweep
    #: (main/train.py:140-163); None skips the sweep
    test_dataset: Optional[object] = None
    #: path to a torchvision ImageNet ResNet .pth: the backbone is
    #: overwritten with converted weights before training (the reference's
    #: `init_weights` model-zoo init, common/nets/resnet.py:70-76); a
    #: `--continue` resume wins over it
    imagenet_init: Optional[str] = None
    #: device mesh for sharded training: pass `parallel.make_mesh(...)` for
    #: an explicit layout, or set `auto_mesh` to build a process-aware
    #: (data, model) mesh over all visible devices — the runner-level
    #: equivalent of the reference defaulting to DataParallel over all GPUs
    #: (common/base.py:141-145). cli/train.py turns auto_mesh on by default
    #: whenever >1 device is visible (`--mesh none` opts out). The global
    #: batch is cfg.train.batch_size and must divide by the data-axis size;
    #: each process feeds only its local slice.
    mesh: Optional[object] = None
    #: model-axis size for the auto-built mesh (shards the 1176-channel
    #: final heatmap projection; 1 = pure DP, the reference's layout)
    model_parallelism: int = 1
    auto_mesh: bool = False

    def __post_init__(self):
        self.logger = color_logger(self.log_dir, "train_logs.txt")
        self._local_batch = self.cfg.train.batch_size
        self.model = get_pose_net(self.cfg.model)
        steps_per_epoch = max(
            1, len(self.dataset) // self.cfg.train.batch_size)
        self.steps_per_epoch = steps_per_epoch
        self.tx = make_optimizer(self.cfg.train, steps_per_epoch)
        from hand_integral_pose_estimation_tpu.training.state import (
            multistep_schedule,
        )
        self._sched = multistep_schedule(
            self.cfg.train.lr, steps_per_epoch, self.cfg.train.lr_dec_epoch,
            self.cfg.train.lr_dec_factor)

        sample = jnp.zeros(
            (1, *self.cfg.model.input_shape, 3), jnp.float32)
        self.state, _ = create_train_state(
            self.model, jax.random.PRNGKey(self.seed), sample,
            self.cfg.train, steps_per_epoch, tx=self.tx)
        if self.imagenet_init:
            from hand_integral_pose_estimation_tpu.interop import (
                imagenet_init_pose_variables,
                load_torch_state_dict,
            )
            new_vars = imagenet_init_pose_variables(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
                load_torch_state_dict(self.imagenet_init),
                self.cfg.model.resnet_type)
            self.state = dataclasses.replace(
                self.state, params=new_vars["params"],
                batch_stats=new_vars["batch_stats"])
            self.logger.info("backbone initialised from ImageNet weights "
                             "(%s)", self.imagenet_init)
        self.start_epoch = 0
        if self.continue_train:
            try:
                self.state, epoch = ckpt.load_checkpoint(
                    self.model_dir, self.state)
                self.start_epoch = epoch + 1
                self.logger.info("resumed from snapshot_%d", epoch)
            except FileNotFoundError:
                self.logger.info("no snapshot found; training from scratch")

        if self.mesh is None and (self.auto_mesh
                                  or self.model_parallelism > 1) \
                and jax.device_count() > 1:
            from hand_integral_pose_estimation_tpu.parallel import (
                make_mesh, make_multihost_mesh,
            )
            mp = self.model_parallelism
            if mp < 1 or mp > jax.device_count() \
                    or jax.device_count() % mp:
                raise ValueError(
                    f"model_parallelism {mp} must be >=1 and divide the "
                    f"visible device count {jax.device_count()}")
            data_n = jax.device_count() // mp
            if self.cfg.train.batch_size % max(data_n, 1) == 0:
                self.mesh = make_multihost_mesh(model_parallelism=mp)
            elif jax.process_count() == 1:
                # auto mode adapts instead of erroring: largest data-axis
                # size that divides the batch (an explicit mesh=/--mesh
                # layout still raises below — the user asked for it)
                data_n = next(d for d in range(data_n, 0, -1)
                              if self.cfg.train.batch_size % d == 0)
                if data_n * mp > 1:
                    self.mesh = make_mesh(
                        model_parallelism=mp,
                        devices=jax.devices()[:data_n * mp])
                    self.logger.info(
                        "auto mesh: batch %d not divisible by %d devices; "
                        "using %d", self.cfg.train.batch_size,
                        jax.device_count(), data_n * mp)
                else:
                    self.logger.info(
                        "auto mesh: batch %d has no usable data-axis split "
                        "over %d devices; training single-device",
                        self.cfg.train.batch_size, jax.device_count())
            else:
                raise ValueError(
                    f"batch_size {self.cfg.train.batch_size} must divide "
                    f"by the multi-host data-axis size {data_n}")
        if self.mesh is not None:
            from hand_integral_pose_estimation_tpu.parallel import (
                place_state, process_batch_size,
            )
            dsize = self.mesh.shape["data"]
            if self.cfg.train.batch_size % dsize:
                raise ValueError(
                    f"batch_size {self.cfg.train.batch_size} must divide "
                    f"by the data-axis size {dsize}")
            # each process feeds only its local slice of the global batch
            self._local_batch = process_batch_size(
                self.cfg.train.batch_size)
            self.state = place_state(self.mesh, self.state)
            self.logger.info(
                "training over mesh %s",
                dict(zip(self.mesh.axis_names, self.mesh.devices.shape)))

        self.train_step = make_train_step(
            self.model, self.tx, self.cfg,
            teacher_apply=self.teacher_apply, panet_apply=self.panet_apply,
            integral_impl=self.integral_impl, mesh=self.mesh)
        self._preprocess = jax.jit(self._make_preprocess())
        self._scan_train = jax.jit(self._make_scan_train())

        self.metrics = (MetricsWriter(self.metrics_dir)
                        if self.metrics_dir else None)
        self._loader = None
        self._pending_recs = None
        if self.native_prefetch and hasattr(self.dataset, "records"):
            from hand_integral_pose_estimation_tpu.data.native_loader import (
                NativeLoader,
            )
            hw = self.cfg.model.input_shape
            self._loader = NativeLoader(
                self._local_batch, hw[0], hw[1],
                layout="yuv420" if self.yuv_transport else "rgb")
        elif self.yuv_transport:
            raise ValueError("yuv_transport needs native_prefetch and a "
                             "file-backed dataset (records)")
        self.read_timer = Timer()
        self.step_timer = Timer()
        self.total_timer = Timer()

    def _make_preprocess(self):
        acfg = self.cfg.augment
        hw = self.cfg.model.input_shape
        yuv = self.yuv_transport

        def fn(rng, image, joint_cam, K, labelled, ref_bone_len,
               bbox_detector=None, teacher_cam_normalized=None):
            if yuv:
                # packed 4:2:0 planes off the loader: finish the decode
                # on-device (bitwise libjpeg-equal, ops/yuv.py) — fused by
                # XLA into the same program as the augmentation warp
                from hand_integral_pose_estimation_tpu.ops.yuv import (
                    yuv420_to_rgb,
                )
                image = yuv420_to_rgb(image, hw[0], hw[1])
            return pipeline.make_train_batch(
                rng, image, joint_cam, K, bbox_detector, labelled,
                teacher_cam_normalized, ref_bone_len, acfg, hw)
        return fn

    def _make_scan_train(self):
        """One device program running `scan_steps` preprocess+train steps
        over stacked host batches — the whole chunk is a single dispatch."""
        preprocess = self._make_preprocess()
        step = None

        def fn(state, keys, stacked_host):
            def body(state, xs):
                key, host = xs
                batch = preprocess(key, **host)
                state, metrics = self.train_step(state, batch)
                return state, metrics
            return jax.lax.scan(body, state, (keys, stacked_host))
        return fn

    def _sample_records(self, rng):
        idx = self.dataset.sample_indices(rng, self._local_batch)
        return [self.dataset.records[i] for i in idx]

    def _host_batch_kwargs(self, rng):
        if self._loader is not None:
            # double-buffered: collect the batch submitted last call, submit
            # the next one (its decode overlaps the coming device step); each
            # batch is decoded exactly once
            from hand_integral_pose_estimation_tpu.data.freihand import (
                stack_host_batch,
            )
            recs = self._sample_records(rng)
            if self._pending_recs is None:
                # pipeline warm-up: submit this batch, pre-sample the next
                self._loader.submit([r.img_path for r in recs])
                self._pending_recs = recs
                recs = self._sample_records(rng)
            ready = self._pending_recs
            images = self._loader.wait()
            assert len(images) == len(ready), (len(images), len(ready))
            self._loader.submit([r.img_path for r in recs])
            self._pending_recs = recs
            host = stack_host_batch(ready, list(images))
        else:
            idx = self.dataset.sample_indices(rng, self._local_batch)
            host = self.dataset.host_batch(idx)
        return {
            "image": host["image"],
            "joint_cam": host["joint_cam"],
            "K": host["K"],
            "labelled": host["labelled"],
            "ref_bone_len": host["ref_bone_len"],
            "bbox_detector": host["bbox_detector"],
            "teacher_cam_normalized": host["teacher_cam_normalized"],
        }

    def _mesh_ctx(self):
        """`jax.set_mesh` context when sharded, else a no-op."""
        import contextlib
        return (jax.set_mesh(self.mesh) if self.mesh is not None
                else contextlib.nullcontext())

    def _shard(self, host_kwargs, batch_axis: int):
        """Host batch pytree -> mesh-sharded arrays (no-op without a mesh).

        `batch_axis=1` is the scan-chunked layout (scan_steps, B, ...);
        None-valued optional fields pass through untouched."""
        if self.mesh is None:
            return host_kwargs
        from hand_integral_pose_estimation_tpu.parallel import (
            shard_host_batch,
        )
        return shard_host_batch(self.mesh, host_kwargs,
                                batch_axis=batch_axis)

    def run_epoch(self, epoch: int, num_steps: Optional[int] = None,
                  log_every: int = 20) -> dict:
        num_steps = num_steps or self.steps_per_epoch
        # fold the process index into the HOST-side sampling stream: each
        # host feeds a distinct local slice of the global batch, so with a
        # shared seed every host would sample the SAME records and the
        # "global batch" would be n_proc duplicated copies. The jax `key`
        # below stays process-independent on purpose — it parameterises the
        # single logical sharded program (per-sample augmentation noise is
        # drawn on device from per-row folds).
        rng = np.random.RandomState(
            self.seed * 100003 + epoch + 1000003 * jax.process_index())
        key = jax.random.PRNGKey(self.seed * 131 + epoch)
        last_metrics = {}
        k = max(1, self.scan_steps)
        profiling = False
        if self.profile_dir and epoch == self.start_epoch:
            jax.profiler.start_trace(self.profile_dir)
            profiling = True
        for itr in range(0, num_steps, k):
            self.total_timer.tic()
            self.read_timer.tic()
            chunk = [self._host_batch_kwargs(rng)
                     for _ in range(min(k, num_steps - itr))]
            self.read_timer.toc()

            self.step_timer.tic()
            key, sub = jax.random.split(key)
            with self._mesh_ctx():
                if k == 1:
                    host = self._shard(chunk[0], batch_axis=0)
                    batch = self._preprocess(sub, **host)
                    self.state, metrics = self.train_step(self.state, batch)
                else:
                    keys = jax.random.split(sub, len(chunk))
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: (np.stack(xs)
                                     if xs[0] is not None else None),
                        *chunk, is_leaf=lambda x: x is None
                        or not isinstance(x, dict))
                    stacked = self._shard(stacked, batch_axis=1)
                    self.state, metrics = self._scan_train(self.state, keys,
                                                           stacked)
                    metrics = {k2: v[-1] for k2, v in metrics.items()}
            jax.block_until_ready(metrics["loss"])
            self.step_timer.toc()
            self.total_timer.toc()
            if profiling and itr >= 2 * k:
                jax.profiler.stop_trace()
                profiling = False
            if self.metrics is not None:
                scalars = {k2: float(v) for k2, v in metrics.items()}
                scalars["lr"] = float(self._sched(int(self.state.step)))
                self.metrics.write(int(self.state.step), scalars,
                                   prefix="train")

            if itr % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                sec_per_itr = self.total_timer.average_time
                self.logger.info(
                    "epoch %d itr %d/%d loss %.5f (sup %.4f unsup %.4f) "
                    "s_mpjpe %.4f t_mpjpe %.4f lr %.2e | %.3fs/itr "
                    "(read %.3f step %.3f) %.2fh/epoch",
                    epoch, itr, num_steps, m["loss"], m["loss_supervised"],
                    m["loss_unsupervised"], m["student_mpjpe"],
                    m["teacher_mpjpe"],
                    float(self._sched(int(self.state.step))), sec_per_itr,
                    self.read_timer.average_time,
                    self.step_timer.average_time,
                    sec_per_itr * num_steps / 3600.0)
            last_metrics = metrics
        if profiling:
            jax.profiler.stop_trace()
        return {k: float(v) for k, v in last_metrics.items()}

    def fit(self, end_epoch: Optional[int] = None,
            steps_per_epoch: Optional[int] = None,
            save_every: int = 1) -> TrainState:
        end_epoch = end_epoch or self.cfg.train.end_epoch
        tester = None
        for epoch in range(self.start_epoch, end_epoch):
            self.run_epoch(epoch, steps_per_epoch)
            if (epoch + 1) % save_every == 0 or epoch == end_epoch - 1:
                path = ckpt.save_checkpoint(self.model_dir, self.state, epoch)
                self.logger.info("saved %s", path)
            if self.test_dataset is not None:
                # epoch-end 'Average loss on test set' (main/train.py:140-163)
                if tester is None:  # build once so the eval jit cache is kept
                    # the sweep rides the training mesh when the test batch
                    # divides its data axis (else single-device, still valid)
                    tmesh = self.mesh
                    if (tmesh is not None and self.cfg.train.test_batch_size
                            % tmesh.shape["data"]):
                        tmesh = None
                    tester = Tester(self.cfg, self.test_dataset, self.state,
                                    integral_impl=self.integral_impl,
                                    mesh=tmesh)
                tester.state = self.state
                test_loss = tester.mean_loss()
                self.logger.info("epoch %d/%d average loss on test set %.4f",
                                 epoch, end_epoch, test_loss)
                if self.metrics is not None:
                    self.metrics.write(int(self.state.step),
                                       {"loss": test_loss}, prefix="test")
        return self.state


@dataclasses.dataclass
class Tester:
    """No-grad sweep over a dataset collecting integral coords
    (main/test.py:67-143 equivalent); results feed evaluation/.

    With `mesh` set, each batch is sharded over the `data` axis and the
    WHOLE per-batch program (crop/normalise preprocess -> backbone ->
    fused integral decode) runs inside one `shard_map` region, so the
    Pallas warp + fused-head kernels stay partitioned instead of hitting
    the SPMD partitioner's replicated fallback around opaque pallas_calls
    (parallel/shard_ops.py rationale). Per-shard outputs are gathered when
    the host fetches them — the test-time gather of the reference's
    DataParallel eval (main/test.py:92, common/base.py:179-284)."""

    cfg: Config
    dataset: object
    state: TrainState
    integral_impl: str = "auto"
    mesh: Optional[object] = None
    #: decode the sweep's JPEG batches through the C++ prefetch loader with
    #: submit-ahead double buffering (decode overlaps the device step) —
    #: without it a real file-backed split is READ-bound (~1.5k img/s host
    #: decode vs ~9k img/s device rate). Only engages for file-backed
    #: datasets (records) whose frames are already at the model input size.
    native_prefetch: bool = True
    #: ship batches as packed 4:2:0 planes and finish the decode on-device
    #: (bitwise-equal pixels, ops/yuv.py) — halves H2D bytes and host
    #: decode work; requires native_prefetch + (H, W) 4:2:0 JPEGs.
    yuv_transport: bool = False

    def __post_init__(self):
        self.model = get_pose_net(self.cfg.model)
        self.eval_step = make_eval_step(self.model, self.cfg,
                                        self.integral_impl)
        acfg = self.cfg.augment
        hw = self.cfg.model.input_shape
        if self.yuv_transport and not self.native_prefetch:
            raise ValueError("yuv_transport needs native_prefetch")

        def _maybe_decode(image):
            if self.yuv_transport:
                from hand_integral_pose_estimation_tpu.ops.yuv import (
                    yuv420_to_rgb,
                )
                return yuv420_to_rgb(image, hw[0], hw[1])
            return image

        self._preprocess = jax.jit(
            lambda image, joint_cam, K, ref_bone_len, bbox=None:
            pipeline.make_eval_batch(_maybe_decode(image), joint_cam, K,
                                     bbox, ref_bone_len, acfg, hw))
        self._sharded_eval = None
        if self.mesh is not None:
            if "data" not in self.mesh.axis_names:
                raise ValueError(
                    f"Tester mesh must have a 'data' axis; got "
                    f"{self.mesh.axis_names}")
            from jax.sharding import PartitionSpec as P
            from hand_integral_pose_estimation_tpu.training.train_step \
                import make_eval_fn
            eval_fn = make_eval_fn(self.model, self.cfg, self.integral_impl)

            def body(state, image, joint_cam, K, ref_bone_len, bbox):
                batch = pipeline.make_eval_batch(
                    _maybe_decode(image), joint_cam, K, bbox, ref_bone_len,
                    acfg, hw)
                coords, _ = eval_fn(state, batch)
                return coords, batch._replace(image=None)

            data = P("data")
            self._sharded_eval = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                # state replicated (a model-sharded final projection from a
                # mesh Trainer is gathered once on entry), batch over `data`
                in_specs=(P(), data, data, data, data, data),
                out_specs=(data, data), check_vma=False))

    def run(self, batch_size: Optional[int] = None):
        """Sweep every sample exactly once.

        The last partial batch is padded (repeating its final sample) to keep
        device shapes fixed, then padding rows are dropped on host — matching
        the reference DataLoader, which evaluates the full split including the
        smaller tail batch (main/test.py:68-143).

        Only the fields evaluation consumes are accumulated: the (B, 224,
        224, 3) image patches are dropped per batch (merged.image is None) —
        on the real test split (4 versions x 3 254 samples) retaining them
        would hold ~7.8 GB of pixels in host RAM for an evaluator that only
        needs coords + small geometry fields.
        """
        from hand_integral_pose_estimation_tpu.data.freihand import (
            padded_batches,
        )
        bs = batch_size or self.cfg.train.test_batch_size
        if self.mesh is not None:
            dsize = self.mesh.shape["data"]
            if bs % dsize:
                raise ValueError(
                    f"test batch size {bs} must divide by the mesh "
                    f"data-axis size {dsize} (pass batch_size= or set "
                    f"cfg.train.test_batch_size accordingly)")
        n = len(self.dataset)
        coords_all, batches = [], []
        for host in self._host_batches(list(padded_batches(n, bs)), bs):
            if self._sharded_eval is not None:
                coords, batch = self._sharded_eval(
                    self.state, host["image"], host["joint_cam"],
                    host["K"], host["ref_bone_len"], host["bbox_detector"])
            else:
                batch = self._preprocess(host["image"], host["joint_cam"],
                                         host["K"], host["ref_bone_len"],
                                         host["bbox_detector"])
                coords, _ = self.eval_step(self.state, batch)
                batch = batch._replace(image=None)
            coords_all.append(np.asarray(coords))
            batches.append(jax.tree_util.tree_map(np.asarray, batch))
        coords = np.concatenate(coords_all)[:n]
        merged = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs)[:n], *batches)
        return coords, merged

    def _host_batches(self, idxs, bs):
        """Yield host batch dicts for each index block.

        File-backed datasets go through the C++ loader with SUBMIT-AHEAD
        double buffering: batch i+1's JPEG decode runs on the pool while the
        device evaluates batch i (the Trainer's read/step overlap, applied
        to the sweep — the reference's eval DataLoader workers played this
        role, common/base.py:179-284). Everything else (synthetic /
        in-memory datasets) takes the plain host_batch path."""
        recs_all = getattr(self.dataset, "records", None)
        if not (self.native_prefetch and recs_all is not None
                and len(idxs) > 0):
            if self.yuv_transport:
                raise ValueError("yuv_transport needs a file-backed "
                                 "dataset (records)")
            for idx in idxs:
                yield self.dataset.host_batch(idx)
            return
        from hand_integral_pose_estimation_tpu.data.freihand import (
            stack_host_batch,
        )
        from hand_integral_pose_estimation_tpu.data.native_loader import (
            NativeLoader,
        )
        hw = self.cfg.model.input_shape
        loader = NativeLoader(
            bs, hw[0], hw[1],
            layout="yuv420" if self.yuv_transport else "rgb")

        def recs_of(idx):
            return [recs_all[i] for i in idx]

        loader.submit([r.img_path for r in recs_of(idxs[0])])
        for i, idx in enumerate(idxs):
            images = loader.wait()
            if i + 1 < len(idxs):
                loader.submit([r.img_path for r in recs_of(idxs[i + 1])])
            yield stack_host_batch(recs_of(idx), list(images))

    def mean_loss(self, batch_size: Optional[int] = None) -> float:
        """Per-sample-averaged JointLocationLoss over the whole split (the
        epoch-end 'Average loss on test set' sweep, main/train.py:140-163)."""
        coords, merged = self.run(batch_size)
        err = np.abs(coords - merged.label) * merged.label_weight
        return float(err.sum(axis=(1, 2)).mean())


@dataclasses.dataclass
class Evaluator(Tester):
    """Evaluation-split runner (common/base.py:244-284): identical sweep to
    Tester but over the label-free challenge split — batches carry
    detector-derived boxes and dummy joints; downstream use
    evaluation.evaluate_challenge on the collected coords."""
