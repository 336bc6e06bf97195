"""Training loop and controller.

Parity: reference code/train.py (700 LoC):
- ``epoch_train`` — per-batch loop: per-sample forward+loss, validity skip,
  optional outlier injection, TB logging (loss, repro, LR, grad norm),
  gradient clipping, Adam step, per-batch LR schedule (train.py:49-157).
- ``epoch_evaluation`` — no-grad loop over scenes with per-scene OOM
  tolerance and NaN dummy rows (train.py:170-259).
- ``train`` — controller: warmup/exp/multistep schedules stepped per batch,
  early stopping on the validation metric, best/final checkpoints, the
  sequential view-increment curriculum for optimization phases, fine-tune
  initial eval (train.py:372-700).

TPU structure: the loss+grad step and forward are jitted once per graph
bucket shape; scenes are padded to bucketed caps so the compile cache is
reused across samples (SURVEY section 7.3 item 1).
"""

from __future__ import annotations

import copy
import math
import os
from time import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from gasfm_tpu.data.dataset import SceneLoader, ScenesDataSet
from gasfm_tpu.data.outliers import inject_outliers
from gasfm_tpu.data.sampling import get_subset
from gasfm_tpu.data.scene import SceneData
from gasfm_tpu.eval.metrics import (
    compute_core_errors,
    compute_errors,
    get_dummy_errors,
    prepare_predictions,
    unpad_predictions,
)
from gasfm_tpu.losses import get_loss_func
from gasfm_tpu.train.state import build_optimizer, save_params
from gasfm_tpu.utils import paths
from gasfm_tpu.utils.observability import (
    ProfilerWindow,
    dump_predictions,
    get_tb_writer,
    tb_log_eval_step,
    tb_log_train_step,
)
from gasfm_tpu.utils.paths import get_additional_identifiers_for_outlier_injection
from gasfm_tpu.utils.phases import Phases
from gasfm_tpu.train.state import apply_param_updates


def _is_oom_error(e: BaseException) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "out of memory" in s


class GraphBucketizer:
    """SceneData -> SceneGraph with conf-driven bucketing (compile cache
    reuse across samples; replaces the reference's per-sample graph rebuild,
    SURVEY section 3.5).

    Under edge sharding (``n_edge_shards > 1``) edge capacities are rounded
    up so every shard's slice stays CHUNK-aligned — the Pallas kernels'
    layout contract holds per shard."""

    def __init__(self, conf, n_edge_shards: int = 1):
        self.growth = conf.get_float("compile.edge_bucket_growth", default=1.3)
        self.cam_multiple = conf.get_int("compile.view_bucket_multiple", default=8)
        self.pt_multiple = conf.get_int("compile.point_bucket_multiple", default=256)
        self.n_edge_shards = max(int(n_edge_shards), 1)
        # Per-scene chunk: an integer ``compile.chunk`` pins it; otherwise
        # each scene's chunk comes from view_graph.choose_chunk (mean window
        # run; GASFM_CHUNK in the environment still wins inside it).
        self.pinned_chunk = conf.get_int("compile.chunk", default=None)
        # Auto-chunk 2048 is only validated on the PACKED merged-kernel path
        # (the unpacked fused frontend sub-chunks at 1024; the unpacked dual-
        # attention backward builds monolithic chunk-sized blocks whose
        # scoped-VMEM footprint measured 17.7 MB > the 16 MB limit at 2048 —
        # BENCHLOG section 32 item 4). Confs that cannot take the packed
        # path (models/gasfm.py use_packed gate, conf-level part) cap the
        # AUTO choice at 1024; explicit GASFM_CHUNK / compile.chunk pins
        # stay untouched (perf-experiment escape hatches).
        from gasfm_tpu.ops.pallas.packing import packable

        mtype = conf.get_string("model.type", default="")
        self._auto_chunk_cap = 2048
        if "GraphAttnSfMNet" in mtype and not (
            packable(conf.get_int("model.n_feat_proj", default=0), 2048)
            and conf.get_bool("model.use_norm_proj_update", default=False)
            and conf.get_int("model.n_hidden_layers_proj_update", default=0) == 0
        ):
            self._auto_chunk_cap = 1024
        self.table_sharding = conf.get_bool("parallel.table_sharding", default=None)
        if self.table_sharding is None:
            # Default ON for multi-shard meshes: measured better than the
            # replicated combine at every shard count >= 2 (BENCHLOG
            # section 25); single-shard it is a no-op.
            self.table_sharding = self.n_edge_shards > 1

    def chunk_for(self, data: SceneData) -> int:
        from gasfm_tpu.graph.view_graph import choose_chunk

        env_chunk = os.environ.get("GASFM_CHUNK")
        if env_chunk is not None:
            # The documented perf-sweep escape hatch wins even over a conf
            # pin (it also wins inside choose_chunk) — otherwise a sweep
            # against a pinned conf silently measures one configuration.
            # Read live (not view_graph.CHUNK): the module constant is an
            # import-time snapshot. build_view_graph validates the value.
            return int(env_chunk)
        if self.pinned_chunk is not None:
            return self.pinned_chunk
        # data.valid_pts is computed once at SceneData construction — no
        # second O(m*n) M scan here; build_view_graph does its own pass.
        valid = data.valid_pts
        chunk = choose_chunk(int(valid.sum()), int(valid.any(axis=0).sum()))
        # Conf-level cap (see __init__), plus the two trace-time packed
        # gates knowable here: scenes with > 1024 cameras and the
        # GASFM_PACKED=0 A/B kill-switch both force the unpacked path
        # (models/gasfm.py use_packed), which is not 2048-safe.
        if valid.shape[0] > 1024 or os.environ.get("GASFM_PACKED", "1") == "0":
            chunk = min(chunk, 1024)
        return min(chunk, self._auto_chunk_cap)

    def __call__(self, data: SceneData):
        chunk = self.chunk_for(data)
        sg = data.to_scene_graph(
            cam_multiple=self.cam_multiple,
            pt_multiple=self.pt_multiple,
            edge_multiple=chunk * self.n_edge_shards,
            growth=self.growth,
            chunk=chunk,
        )
        if self.table_sharding and self.n_edge_shards > 1:
            # Host-side span<=2 contract of the boundary exchange (see
            # parallel.check_table_shard_contract) — once per built scene.
            from gasfm_tpu.parallel import check_table_shard_contract

            check_table_shard_contract(
                sg.graph.pt_window, self.n_edge_shards, sg.graph.edge_mask,
                chunk=sg.graph.chunk,
            )
        return sg


class TrainingSession:
    """Holds the jitted step functions for one (model, loss, optimizer)."""

    def __init__(self, conf, model, milestone_shift: int = 0):
        self.conf = conf
        self.model = model
        self.loss_func = get_loss_func(conf)
        self.tx, self.schedule = build_optimizer(conf, milestone_shift=milestone_shift)

        # Multi-chip execution (conf `parallel.mesh_shape = [data, edge]`):
        # the production train/eval steps run edge-partitioned over the mesh
        # via shard_map; single-chip otherwise. See parallel/edge_sharding.py.
        from gasfm_tpu.parallel import DATA_AXIS, EDGE_AXIS, mesh_from_conf

        self.mesh = mesh_from_conf(conf)
        self.n_data = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        self.n_edge = self.mesh.shape[EDGE_AXIS] if self.mesh is not None else 1
        self.bucketize = GraphBucketizer(conf, n_edge_shards=self.n_edge)

        # Pallas kernel matmul precision (trace-time; see ops/segment.py).
        from gasfm_tpu.ops.segment import set_kernel_precision

        set_kernel_precision(conf.get_string("compile.kernel_precision", default="f32"))

        def _loss(params, scene):
            pred = model.apply(params, scene.graph)
            return self.loss_func(pred, scene), pred

        self._grad_fn = jax.jit(jax.value_and_grad(_loss, has_aux=True))
        self._fwd_fn = jax.jit(model.apply)

        if self.mesh is not None:
            from gasfm_tpu.parallel import (
                make_sharded_forward,
                make_sharded_fused_step,
                make_sharded_grad_step,
            )

            self._sharded_fused_fn = make_sharded_fused_step(conf, model, self.mesh, tx=self.tx)
            self._sharded_grad_fn = make_sharded_grad_step(conf, model, self.mesh)
            self._sharded_fwd_fn = make_sharded_forward(conf, model, self.mesh)
            self._sharded_fwd_group_fn = make_sharded_forward(
                conf, model, self.mesh, grouped=True
            )

        def _update(params, opt_state, grads):
            grad_norm = optax.global_norm(grads)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = apply_param_updates(params, updates, new_opt_state)
            return new_params, new_opt_state, grad_norm

        self._update_fn = jax.jit(_update, donate_argnums=(0, 1))
        self._acc_fn = jax.jit(lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))
        from gasfm_tpu.train.state import advance_schedule_count

        # Reference parity for batches with NO valid samples: the scheduler
        # still steps (train.py:152) while the optimizer does not (:133).
        self._advance_sched_fn = jax.jit(advance_schedule_count, donate_argnums=0)

        from gasfm_tpu.eval.metrics import core_errors_device

        self._core_fn = jax.jit(core_errors_device)
        # LR logging runs the schedule on the CPU backend: called eagerly on
        # the accelerator it dispatches dozens of tiny ops per batch, which
        # costs >100 ms/step over a tunneled runtime.
        try:
            self._sched_cpu = jax.jit(self.schedule, device=jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            self._sched_cpu = self.schedule

        def _fused_step(params, opt_state, scene):
            (loss, pred), grads = jax.value_and_grad(_loss, has_aux=True)(params, scene)
            grad_norm = optax.global_norm(grads)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = apply_param_updates(params, updates, new_opt_state)
            from gasfm_tpu.eval.metrics import core_errors_device as _ced

            core = _ced(pred, scene)
            return new_params, new_opt_state, loss, core["our_repro"], grad_norm

        # Single-dispatch train step for the dominant 1-valid-sample batch:
        # separate grad/metric/update dispatches each cost multi-ms of host
        # work (arg processing over ~300-leaf pytrees) per call.
        self._fused_step_fn = jax.jit(_fused_step, donate_argnums=(0, 1))

    def fused_step(self, params, opt_state, scene):
        if self.mesh is None:
            return self._fused_step_fn(params, opt_state, scene)
        params, opt_state, loss, repro, _, grad_norm = self.fused_group_step(
            params, opt_state, [scene]
        )
        return params, opt_state, loss, repro, grad_norm

    def fused_group_step(self, params, opt_state, scenes):
        """Multi-chip single-dispatch update over <= n_data valid scenes
        (weight-padded to the data-axis size; padded slots contribute 0)."""
        from gasfm_tpu.parallel import pad_scene_group

        batched, weights = pad_scene_group(scenes, self.n_data)
        return self._sharded_fused_fn(params, opt_state, batched, jnp.asarray(weights))

    def core_errors(self, pred, scene):
        """On-device our_repro (one scalar fetch; see core_errors_device)."""
        return self._core_fn(pred, scene)

    def lr_at(self, step: int) -> float:
        return float(self._sched_cpu(step))

    def loss_and_grads(self, params, scene):
        if self.mesh is None:
            (loss, pred), grads = self._grad_fn(params, scene)
            return loss, pred, grads
        from gasfm_tpu.parallel import pad_scene_group

        batched, weights = pad_scene_group([scene], self.n_data)
        loss, grads, pred_b = self._sharded_grad_fn(params, batched, jnp.asarray(weights))
        pred = jax.tree_util.tree_map(lambda x: x[0], pred_b)
        return loss, pred, grads

    def forward(self, params, scene):
        if self.mesh is None:
            return self._fwd_fn(params, scene.graph)
        from gasfm_tpu.parallel import stack_scene_graphs

        # Every data-group evaluates the same scene (replicated compute over
        # the data axis; edge-partitioned within each group).
        batched = stack_scene_graphs([scene] * self.n_data)
        return self._sharded_fwd_fn(params, batched)

    def forward_group(self, params, scenes):
        """Evaluate up to n_data DIFFERENT same-capacity scenes in one
        sharded call — one per data group — returning a per-scene list of
        pred dicts. Falls back to per-scene forwards off-mesh."""
        if self.mesh is None or self.n_data <= 1:
            return [self.forward(params, s) for s in scenes]
        from gasfm_tpu.parallel import pad_scene_group

        batched, _ = pad_scene_group(list(scenes), self.n_data)
        preds = self._sharded_fwd_group_fn(params, batched)
        return [
            jax.tree_util.tree_map(lambda x, i=i: x[i], preds)
            for i in range(len(scenes))
        ]

    def accumulate(self, grads_a, grads_b):
        return self._acc_fn(grads_a, grads_b)

    def update(self, params, opt_state, grads):
        return self._update_fn(params, opt_state, grads)

    def advance_schedule(self, opt_state):
        """Step only the LR schedule (all-invalid batch; see state.py)."""
        return self._advance_sched_fn(opt_state)


# ---------------------------------------------------------------------------
# Epoch train
# ---------------------------------------------------------------------------


def _prepare_batches(train_loader, session, outlier_injection_rate, rng, epoch, depth: int = 2):
    """Pipeline the per-sample host work (validity check, outlier injection,
    graph bucketize + device feed) with device compute via one prefetch
    thread. The reference hides the same work in DataLoader worker processes
    (reference multiple_scenes_learning.py:48-50); here the sampling itself
    is already prefetched by SceneLoader, and this stage overlaps the
    remaining per-sample preprocessing. Yields lists of
    (scene_data, scene_graph-or-None) in the loader's order — RNG draws stay
    sequential in one thread, so determinism per seed is preserved.

    Abandonment safety (a device OOM propagating out of the train loop must
    not leak a thread holding device-resident SceneGraphs) lives in the one
    shared pump, data/dataset.prefetch_iter."""
    from gasfm_tpu.data.dataset import prefetch_iter

    def _source():
        for train_batch in train_loader:
            prepared = []
            for curr_data in train_batch:
                if not curr_data.is_valid_sample():
                    print(
                        f"{epoch} {curr_data.scene_name} has a camera with not enough "
                        "points or a point with not enough cameras"
                    )
                    prepared.append((curr_data, None))
                    continue
                model_data = curr_data
                if outlier_injection_rate is not None:
                    injected = inject_outliers(curr_data, outlier_injection_rate, rng=rng)
                    if injected is None:
                        print(
                            f"Failed outlier sampling for {curr_data.scene_name} - "
                            "skipping training sample."
                        )
                        prepared.append((curr_data, None))
                        continue
                    model_data = injected
                prepared.append((curr_data, session.bucketize(model_data)))
            yield prepared

    yield from prefetch_iter(_source, depth)


def epoch_train(
    conf,
    session: TrainingSession,
    train_loader,
    params,
    opt_state,
    n_updates: int,
    epoch: int,
    phase: Phases,
    tb_writer,
    outlier_injection_rate: Optional[float] = None,
    additional_identifiers: Optional[List[str]] = None,
    scene: Optional[str] = None,
    prev_n_batches: int = 0,
    tb_log_train_per_scene: Optional[bool] = True,
    rng: Optional[np.random.Generator] = None,
):
    """One epoch. Returns (params, opt_state, n_updates, mean_loss, losses, n_batches)."""
    additional_identifiers = list(additional_identifiers or [])
    view_head = conf.get_bool("model.view_head.enabled")
    scenepoint_head = conf.get_bool("model.scenepoint_head.enabled")
    explicit = view_head and scenepoint_head
    calc_backproj = conf.get_bool("eval.calc_reprojerr_with_gtposes_for_depth_pred", default=False)

    train_losses: List[float] = []

    # Deferred metric consumption: device scalars of batch i are fetched
    # while batch i+1 is being dispatched (after an async host copy), so the
    # per-step device->host round trip — tens of ms over a tunneled runtime —
    # overlaps compute instead of serializing the loop. TB rows keep their
    # correct step indices; they are merely WRITTEN one batch late.
    loss_totals = {"sum": 0.0, "n": 0}

    def _flush(pnd):
        losses = [float(x) for x in pnd["loss_parts"]]
        train_losses.extend(losses)
        batch_loss = float(sum(losses))
        n = pnd["n"]
        # Per-SAMPLE mean bookkeeping: a multi-chip fused group contributes
        # one summed loss entry for n samples, so the mean must weight by n.
        loss_totals["sum"] += batch_loss
        loss_totals["n"] += n
        nb = pnd.get("n_batch", n)  # reference: mean over the FULL batch
        batch_mean_repro = (
            float(sum(float(x) for x in pnd["repro_parts"])) / nb if (explicit and nb) else 0.0
        )
        batch_mean_repro_backproj = (sum(pnd["backproj_parts"]) / nb) if (calc_backproj and nb) else 0.0
        step_idx = pnd["step_idx"]
        curr_scene_name = pnd["scene_name"]
        if tb_writer is not None:
            log_scene = None if phase == Phases.TRAINING else curr_scene_name
            tb_log_train_step(tb_writer, step_idx, "loss", batch_loss, phase,
                              additional_identifiers, scene=log_scene)
            if explicit:
                tb_log_train_step(tb_writer, step_idx, "our_repro", batch_mean_repro, phase,
                                  additional_identifiers, scene=log_scene)
            if calc_backproj:
                tb_log_train_step(tb_writer, step_idx, "repro_backproj_rnd_gt_2view",
                                  batch_mean_repro_backproj, phase, additional_identifiers, scene=log_scene)
            if phase == Phases.TRAINING and tb_log_train_per_scene and curr_scene_name is not None:
                tb_log_train_step(tb_writer, step_idx, "loss", batch_loss, phase,
                                  additional_identifiers, scene=curr_scene_name)
            tb_log_train_step(tb_writer, step_idx, "learning_rate", pnd["lr"], phase,
                              additional_identifiers, scene=log_scene)
            if pnd["grad_norm"] is not None:
                tb_log_train_step(tb_writer, step_idx, "grad_norm", float(pnd["grad_norm"]), phase,
                                  additional_identifiers,
                                  scene=None if phase == Phases.TRAINING else curr_scene_name)

    def _host_async(x):
        try:
            x.copy_to_host_async()
        except AttributeError:
            pass
        return x

    pending = None
    batch_idx = -1
    for batch_idx, prepared_batch in enumerate(
        _prepare_batches(train_loader, session, outlier_injection_rate, rng, epoch)
    ):
        loss_parts: List[Any] = []
        repro_parts: List[Any] = []
        backproj_parts: List[float] = []
        grads_sum = None
        curr_scene_name = scene

        device_metrics = explicit and not calc_backproj and outlier_injection_rate is None
        valid_samples = [(cd, sg) for cd, sg in prepared_batch if sg is not None]

        # Single-dispatch fused path: grad + update + on-device metrics as
        # ONE dispatch — separate jitted calls each cost multi-ms of
        # host-side argument processing per step. Single-chip: batches of one
        # valid sample (the dominant case). Multi-chip: any batch of up to
        # data-axis-size same-capacity samples (weight-padded scene groups).
        fused_group = None
        if device_metrics and valid_samples:
            if session.mesh is None:
                if len(valid_samples) == 1:
                    fused_group = valid_samples
            elif len(valid_samples) <= session.n_data:
                caps = {
                    (sg.graph.num_cams, sg.graph.num_pts, sg.graph.num_edges,
                     sg.graph.chunk)
                    for _, sg in valid_samples
                }
                if len(caps) == 1:
                    fused_group = valid_samples
        if fused_group is not None:
            curr_scene_name = fused_group[-1][0].scene_name
            if session.mesh is None:
                params, opt_state, loss, repro, grad_norm = session.fused_step(
                    params, opt_state, fused_group[0][1]
                )
            else:
                params, opt_state, loss, repro, _, grad_norm = session.fused_group_step(
                    params, opt_state, [sg for _, sg in fused_group]
                )
            # loss/repro are sums over the group's samples; with one sample
            # per batch (the reference's dominant shape) they are per-sample.
            loss_parts.append(_host_async(loss))
            repro_parts.append(_host_async(repro))
            _host_async(grad_norm)
            if pending is not None:
                _flush(pending)
            pending = {
                "loss_parts": loss_parts,
                "repro_parts": repro_parts,
                "backproj_parts": backproj_parts,
                "n": len(fused_group),
                "n_batch": len(prepared_batch),
                "step_idx": prev_n_batches + batch_idx,
                "scene_name": curr_scene_name,
                "lr": session.lr_at(n_updates),
                "grad_norm": grad_norm,
            }
            n_updates += 1
            continue

        for curr_data, scene_graph in valid_samples:
            curr_scene_name = curr_data.scene_name

            loss, pred, grads = session.loss_and_grads(params, scene_graph)
            if device_metrics:
                # On-device metric: one deferred scalar instead of pulling
                # full predictions to the host and building dense arrays
                # per step. (With outlier injection the reference scores
                # predictions against the CLEAN observations — the host
                # path below keeps that.)
                repro_parts.append(
                    _host_async(session.core_errors(pred, scene_graph)["our_repro"])
                )
            elif explicit or calc_backproj:
                # Guarded: with neither per-step metric configured (e.g.
                # depth-head-only training) compute_core_errors would return
                # {} — skip the full padded-prediction host pull + dense
                # densification it would otherwise pay every step.
                pred_np = unpad_predictions(pred, curr_data, graph=scene_graph.graph)
                core = compute_core_errors(curr_data, pred_np, conf)
                if explicit:
                    repro_parts.append(core["our_repro"])
                if calc_backproj:
                    backproj_parts.append(core["repro_backproj_rnd_gt_2view"])
            loss_parts.append(_host_async(loss))
            grads_sum = grads if grads_sum is None else session.accumulate(grads_sum, grads)

        grad_norm = None
        if grads_sum is not None:
            # (The pre-async code additionally skipped the update when the
            # batch loss was exactly 0.0 — unobservable in practice.)
            params, opt_state, grad_norm = session.update(params, opt_state, grads_sum)
            _host_async(grad_norm)
        else:
            # All samples invalid: the reference still steps the scheduler
            # (train.py:152, outside the batch_loss>0 gate) but not the
            # optimizer — advance the applied schedule to match, or every
            # later LR lands one step late vs the logged schedule(n_updates).
            opt_state = session.advance_schedule(opt_state)

        if pending is not None:
            _flush(pending)
        pending = {
            "loss_parts": loss_parts,
            "repro_parts": repro_parts,
            "backproj_parts": backproj_parts,
            "n": len(loss_parts),
            # Metric denominator parity: the reference divides the batch
            # repro/backproj means by len(train_batch) INCLUDING invalid
            # samples (train.py:97-99); loss bookkeeping stays per-VALID-
            # sample ("n"), matching its train_losses mean.
            "n_batch": len(prepared_batch),
            "step_idx": prev_n_batches + batch_idx,
            "scene_name": curr_scene_name,
            "lr": session.lr_at(n_updates),
            "grad_norm": grad_norm,
        }
        n_updates += 1  # the reference steps the scheduler every batch

    if pending is not None:
        _flush(pending)
    n_batches = batch_idx + 1
    mean_loss = (
        loss_totals["sum"] / loss_totals["n"] if loss_totals["n"] else float("nan")
    )
    return params, opt_state, n_updates, mean_loss, train_losses, n_batches


# ---------------------------------------------------------------------------
# Epoch evaluation
# ---------------------------------------------------------------------------


def eval_errors_list2df(errors_list: List[Dict]) -> pd.DataFrame:
    """Parity: reference train.py:160-168."""
    df = pd.DataFrame(errors_list)
    df.set_index("Scene", inplace=True)
    mean_errors = df.mean(axis=0, numeric_only=True).to_frame(name="Mean").T
    mean_errors.index.name = "Scene"
    df = pd.concat([df, mean_errors], axis=0)
    print(df.round(3).to_string(), flush=True)
    return df


def aggregate_val_metric(validation_errors: pd.DataFrame, metric_column: str, scene: Optional[str] = None):
    """Parity: reference train.py:262-269."""
    assert isinstance(metric_column, str)
    if scene is None:
        scene = "Mean"
    return validation_errors.loc[[scene], [metric_column]].values.item()


def epoch_evaluation(
    data_loader,
    session: TrainingSession,
    params,
    conf,
    epoch: Optional[int],
    phase: Phases,
    outlier_injection_rate: Optional[float] = None,
    dump_and_plot_predictions: bool = False,
    additional_identifiers: Optional[List[str]] = None,
    bundle_adjustment: bool = True,
    log_memory_consumption: bool = False,
    crash_on_scene_exhausting_memory: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> pd.DataFrame:
    """Parity: reference train.py:170-259."""
    additional_identifiers = list(additional_identifiers or [])
    view_head = conf.get_bool("model.view_head.enabled")
    scenepoint_head = conf.get_bool("model.scenepoint_head.enabled")
    explicit = view_head and scenepoint_head

    def _prep(curr_data):
        if outlier_injection_rate is not None:
            injected = inject_outliers(curr_data, outlier_injection_rate, rng=rng)
            assert injected is not None
            model_data = injected
        else:
            model_data = curr_data
        return curr_data, session.bucketize(model_data)

    def _post(curr_data, scene_graph, pred, pred_time):
        pred_np = unpad_predictions(pred, curr_data, graph=scene_graph.graph)
        outputs = prepare_predictions(curr_data, pred_np, conf, bundle_adjustment)
        errors = compute_errors(outputs, conf, bundle_adjustment)
        errors["Inference time"] = pred_time
        errors["Scene"] = curr_data.scene_name

        if epoch is None:
            errors.update(curr_data.get_data_statistics())

        if dump_and_plot_predictions:
            out_clean = {k: v for k, v in outputs.items() if not isinstance(v, dict)}
            dump_predictions(conf, out_clean, curr_data.scene_name, phase, epoch=epoch,
                             additional_identifiers=additional_identifiers)
            if conf.get_bool("dataset.calibrated") and explicit:
                from gasfm_tpu.utils.plotting import plot_cameras_before_and_after_ba

                plot_cameras_before_and_after_ba(
                    outputs, errors, conf, phase, scene=curr_data.scene_name,
                    epoch=epoch, bundle_adjustment=bundle_adjustment,
                    additional_identifiers=additional_identifiers,
                )
        return errors

    def _dummy(curr_data):
        errors = get_dummy_errors(conf, bundle_adjustment)
        errors["Inference time"] = float("nan")
        errors["Scene"] = curr_data.scene_name
        return errors

    errors_list = []
    use_groups = session.mesh is not None and session.n_data > 1
    if use_groups:
        # Data-mesh eval: shard DIFFERENT scenes across the data axis (one
        # per group) instead of replicating one scene over all groups.
        # Scenes of MIXED capacities are bucket-padded to the group maximum
        # (round-3 verdict item 7), groups are built LAZILY (host memory
        # stays O(n_data), not O(eval sweep)), and a scene failing during
        # prep degrades to its dummy row instead of aborting the sweep
        # (round-3 ADVICE item 2).
        def _prep_outlier(curr_data):
            if outlier_injection_rate is not None:
                injected = inject_outliers(curr_data, outlier_injection_rate, rng=rng)
                assert injected is not None
                return injected
            return curr_data

        def _flush(group):
            # group: list of (curr_data, model_data, scene_graph).
            caps = (
                max(sg.graph.num_cams for _, _, sg in group),
                max(sg.graph.num_pts for _, _, sg in group),
                max(sg.graph.num_edges for _, _, sg in group),
            )
            # Stacked graphs must share ONE chunk (static pytree metadata).
            # The group min is always safe: caps built at a larger chunk are
            # multiples of the smaller one, and per-window padding only
            # shrinks with the chunk.
            chunk = min(sg.graph.chunk for _, _, sg in group)
            padded = []
            buck = session.bucketize
            for curr_data, model_data, sg in group:
                g = sg.graph
                if (g.num_cams, g.num_pts, g.num_edges) != caps or g.chunk != chunk:
                    # Bucketed caps are multiples of the bucketizer grid,
                    # so the group max keeps every alignment contract.
                    sg = model_data.to_scene_graph(caps=caps, chunk=chunk)
                    if buck.table_sharding and buck.n_edge_shards > 1:
                        # The span<=2 contract was checked at the graph's OWN
                        # caps/chunk in GraphBucketizer.__call__; the re-pad
                        # shifts shard boundaries and the chunk grid, so the
                        # boundary exchange's loud contract check must re-run
                        # or a violation silently corrupts point aggregates.
                        from gasfm_tpu.parallel import check_table_shard_contract

                        check_table_shard_contract(
                            sg.graph.pt_window, buck.n_edge_shards,
                            sg.graph.edge_mask, chunk=sg.graph.chunk,
                        )
                padded.append((curr_data, sg))
            done = 0  # scenes whose REAL rows are already appended
            try:
                begin = time()
                preds = session.forward_group(params, [sg for _, sg in padded])
                jax.block_until_ready(preds)
                pred_time = (time() - begin) / len(padded)
                for (curr_data, sg), pred in zip(padded, preds):
                    errors_list.append(_post(curr_data, sg, pred, pred_time))
                    done += 1
            except Exception as e:  # noqa: BLE001 - OOM-tolerance parity
                if not _is_oom_error(e):
                    raise
                if crash_on_scene_exhausting_memory:
                    raise
                # Dummy rows only for scenes WITHOUT a real row yet (an OOM
                # in _post mid-group must not duplicate earlier scenes'
                # 'Scene' index — that would skew the Mean row and break
                # .loc[[scene]].item() lookups).
                for curr_data, _ in padded[done:]:
                    print(f"Ran out of memory when evaluating on {curr_data.scene_name}.")
                    errors_list.append(_dummy(curr_data))

        pending = []
        for batch_data in data_loader:
            for curr_data in batch_data:
                try:
                    model_data = _prep_outlier(curr_data)
                    sg = session.bucketize(model_data)
                except Exception as e:  # noqa: BLE001 - OOM-tolerance parity
                    if not _is_oom_error(e) or crash_on_scene_exhausting_memory:
                        raise
                    print(f"Ran out of memory when evaluating on {curr_data.scene_name}.")
                    errors_list.append(_dummy(curr_data))
                    continue
                pending.append((curr_data, model_data, sg))
                if len(pending) == session.n_data:
                    _flush(pending)
                    pending = []
        if pending:
            _flush(pending)
        return eval_errors_list2df(errors_list)

    for j, batch_data in enumerate(data_loader):
        if log_memory_consumption:
            print(f"Scene batch {j + 1}/{len(data_loader)}.")
        for curr_data in batch_data:
            try:
                curr_data, scene_graph = _prep(curr_data)
                begin = time()
                pred = session.forward(params, scene_graph)
                jax.block_until_ready(pred)
                pred_time = time() - begin
                errors = _post(curr_data, scene_graph, pred, pred_time)
            except Exception as e:  # noqa: BLE001 - OOM-tolerance parity
                if not _is_oom_error(e):
                    raise
                if crash_on_scene_exhausting_memory:
                    raise
                print(f"Ran out of memory when evaluating on {curr_data.scene_name}.")
                errors = _dummy(curr_data)

            errors_list.append(errors)

    return eval_errors_list2df(errors_list)


# ---------------------------------------------------------------------------
# Controller
# ---------------------------------------------------------------------------


def train(
    conf,
    train_loader,
    model,
    params,
    phase: Phases,
    train_loader_for_eval=None,
    val_loader=None,
    test_loader=None,
    additional_identifier: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
):
    """Parity: reference train.train (train.py:372-700).

    Returns (trained_params: dict, train_stats: DataFrame).
    """
    additional_identifiers = [] if additional_identifier is None else [additional_identifier]
    n_epochs = conf.get_int("train.n_epochs")
    sequentially_increment_views = (
        False if phase == Phases.TRAINING
        else conf.get_bool("train.sequentially_increment_views", default=False)
    )
    outlier_injection_rate = conf.get_float("train.outlier_injection_rate", default=None)
    print_interval = conf.get_int("train.print_interval", default=None)
    eval_interval = conf.get_int("eval.eval_interval", default=500)
    finetune_dump_model_interval = conf.get_int("train.finetune_dump_model_interval", default=None)
    finetune_dump_and_plot_pred_interval = conf.get_int(
        "train.finetune_dump_and_plot_pred_interval", default=None
    )
    stdout_log_eval_memory = conf.get_bool("memory.stdout_log_eval_memory_consumption", default=False)
    depth_head = conf.get_bool("model.depth_head.enabled")
    view_head = conf.get_bool("model.view_head.enabled")
    scenepoint_head = conf.get_bool("model.scenepoint_head.enabled")
    explicit = view_head and scenepoint_head
    lr_warmup_n_steps = conf.get_int("train.lr_schedule.lr_warmup_n_steps", default=0)
    if rng is None:
        rng = np.random.default_rng(conf.get_int("random_seed", default=0))

    tb_log_train_per_scene = conf.get_bool("train.tb_log_train_per_scene", default=False)
    tb_log_val_per_scene = conf.get_bool("train.tb_log_val_per_scene", default=False)

    milestone_shift = 0
    n_epochs_sequential = 0
    fullscene_data = None
    if phase != Phases.TRAINING:
        assert phase in (Phases.FINE_TUNE, Phases.SHORT_OPTIMIZATION, Phases.OPTIMIZATION)
        if train_loader_for_eval is None:
            train_loader_for_eval = train_loader
        assert len(train_loader) == 1
        the_batch = next(iter(train_loader))
        assert len(the_batch) == 1
        if sequentially_increment_views:
            increment_views_interval = conf.get_int("train.increment_views_interval")
            fullscene_data = the_batch[0]
            total_n_views = fullscene_data.y.shape[0]
            prev_n_views = None
            curr_n_views = None
            n_epochs_sequential = (total_n_views - 1) * increment_views_interval
            n_epochs += n_epochs_sequential
            milestone_shift = n_epochs_sequential

    if phase == Phases.TRAINING:
        if conf.get_bool("eval.eval_on_train_set", default=False):
            assert train_loader_for_eval is not None
        validation_metric = conf.get_string("train.validation_metric", default=None)
        if validation_metric is None:
            if explicit:
                validation_metric = "our_repro"
            elif depth_head:
                validation_metric = "repro_backproj_rnd_gt_2view"
        if validation_metric == "repro_backproj_rnd_gt_2view" and not conf.get_bool(
            "eval.calc_reprojerr_with_gtposes_for_depth_pred", default=False
        ):
            # Fail fast: compute_errors only emits this column when the flag
            # is on (eval/metrics.py skips the depth-stat block instead of
            # crashing), so the first validation would otherwise die with a
            # bare KeyError deep in aggregate_val_metric. Same requirement
            # as the reference (its conf.get_bool has no default, and its
            # depth confs ship the flag true — evaluation.py:236,277).
            raise ValueError(
                "train.validation_metric 'repro_backproj_rnd_gt_2view' requires "
                "eval.calc_reprojerr_with_gtposes_for_depth_pred = true (or set "
                "train.validation_metric explicitly)."
            )
    else:
        validation_metric = None

    assert (phase == Phases.TRAINING) == (val_loader is not None)
    # test_loader is asserted but unused INSIDE train(), exactly like the
    # reference (train.py:372,429 — the test set is evaluated separately by
    # eval_model); kept for signature parity.
    assert (phase == Phases.TRAINING) == (test_loader is not None)

    tb_writer = get_tb_writer(conf)
    session = TrainingSession(conf, model, milestone_shift=milestone_shift)
    # Train a copy: the in-loop update donates its buffers, and the caller's
    # params must stay intact (parity: the reference deep-copies the model,
    # train.py:390).
    params = jax.tree_util.tree_map(jnp.array, params)
    # train.param_dtype: carry the weights in bf16 from step 0 (mirrors
    # create_train_state). Without this, tx.update's f32-master wrapper
    # would flip params to bf16 mid-run after the first update, retracing
    # every jitted step and giving step 0 different numerics (ADVICE r4).
    from gasfm_tpu.train.state import cast_params_for_training

    params = cast_params_for_training(conf, params)
    opt_state = session.tx.init(params)
    n_updates = 0

    best_validation_metric = math.inf
    best_params = None
    best_epoch = -1
    converge_time = -1.0
    final_validation_metric = float("nan")
    begin_time = time()

    run_ba = conf.get_bool("ba.run_ba", default=True)
    ba_during_training = run_ba and not conf.get_bool("ba.only_last_eval")
    outlier_ids = get_additional_identifiers_for_outlier_injection(outlier_injection_rate)

    def run_evals(epoch: int, dump_and_plot: bool):
        """Shared eval block for init and per-interval evaluation
        (reference train.py:486-547 and 587-631)."""
        nonlocal_result = {}
        if phase == Phases.TRAINING:
            validation_errors = epoch_evaluation(
                val_loader, session, params, conf, epoch, Phases.VALIDATION,
                outlier_injection_rate=outlier_injection_rate,
                dump_and_plot_predictions=dump_and_plot,
                additional_identifiers=additional_identifiers + outlier_ids,
                bundle_adjustment=ba_during_training,
                log_memory_consumption=stdout_log_eval_memory,
                crash_on_scene_exhausting_memory=True,
                rng=rng,
            )
            def _log_eval(errors, phase, ids, per_scene_key):
                """Scene-avg TB row + optional per-scene rows. Missing
                metric columns/scene rows are skipped INSIDE
                tb_log_eval_step (its per-metric try/except KeyError), so no
                guard is needed here."""
                tb_log_eval_step(conf, tb_writer, epoch, errors, phase=phase,
                                 additional_identifiers=ids,
                                 include_post_ba_metrics=ba_during_training)
                if per_scene_key is not None:
                    for sc in conf.get_list(per_scene_key, default=[]):
                        tb_log_eval_step(conf, tb_writer, epoch, errors, phase=phase,
                                         additional_identifiers=ids, scene=sc,
                                         include_post_ba_metrics=ba_during_training)

            val_per_scene = "dataset.validation_set" if tb_log_val_per_scene else None
            _log_eval(validation_errors, Phases.VALIDATION,
                      additional_identifiers + outlier_ids, val_per_scene)
            if outlier_injection_rate is not None:
                # Extra outlier-FREE validation (reference train.py:497-501).
                validation_errors = epoch_evaluation(
                    val_loader, session, params, conf, epoch, Phases.VALIDATION,
                    outlier_injection_rate=None, dump_and_plot_predictions=dump_and_plot,
                    additional_identifiers=additional_identifiers,
                    bundle_adjustment=ba_during_training,
                    log_memory_consumption=stdout_log_eval_memory,
                    crash_on_scene_exhausting_memory=True, rng=rng,
                )
                _log_eval(validation_errors, Phases.VALIDATION,
                          additional_identifiers, val_per_scene)
            if conf.get_bool("eval.eval_on_train_set", default=False):
                # Train-set evaluation + per-scene rows + (with outlier
                # injection) an extra outlier-free pass — the full reference
                # block (train.py:503-516).
                def _train_eval(oir, ids):
                    te = epoch_evaluation(
                        train_loader_for_eval, session, params, conf, epoch, Phases.TRAINING,
                        outlier_injection_rate=oir,
                        dump_and_plot_predictions=dump_and_plot,
                        additional_identifiers=ids,
                        bundle_adjustment=ba_during_training,
                        log_memory_consumption=stdout_log_eval_memory,
                        crash_on_scene_exhausting_memory=True, rng=rng,
                    )
                    _log_eval(te, Phases.TRAINING, ids,
                              "dataset.train_set" if tb_log_train_per_scene else None)

                _train_eval(outlier_injection_rate, additional_identifiers + outlier_ids)
                if outlier_injection_rate is not None:
                    _train_eval(None, additional_identifiers)
            nonlocal_result["validation_errors"] = validation_errors
        else:
            scene = conf.get_string("dataset.scene")
            train_errors = epoch_evaluation(
                train_loader_for_eval, session, params, conf, epoch, phase,
                outlier_injection_rate=outlier_injection_rate,
                dump_and_plot_predictions=dump_and_plot,
                additional_identifiers=additional_identifiers + outlier_ids,
                bundle_adjustment=ba_during_training,
                log_memory_consumption=stdout_log_eval_memory,
                crash_on_scene_exhausting_memory=True, rng=rng,
            )
            tb_log_eval_step(conf, tb_writer, epoch, train_errors, phase=phase,
                             additional_identifiers=additional_identifiers + outlier_ids,
                             scene=scene, include_post_ba_metrics=ba_during_training)
            if outlier_injection_rate is not None:
                train_errors_of = epoch_evaluation(
                    train_loader_for_eval, session, params, conf, epoch, phase,
                    outlier_injection_rate=None, dump_and_plot_predictions=dump_and_plot,
                    additional_identifiers=additional_identifiers,
                    bundle_adjustment=ba_during_training,
                    log_memory_consumption=stdout_log_eval_memory,
                    crash_on_scene_exhausting_memory=True, rng=rng,
                )
                tb_log_eval_step(conf, tb_writer, epoch, train_errors_of, phase=phase,
                                 additional_identifiers=additional_identifiers,
                                 scene=scene, include_post_ba_metrics=ba_during_training)
            nonlocal_result["validation_errors"] = train_errors
        return nonlocal_result["validation_errors"]

    # Initial evaluation (always before fine-tuning; reference train.py:486)
    if conf.get_bool("eval.eval_init", default=False) or phase == Phases.FINE_TUNE:
        epoch = -1
        dump_and_plot = finetune_dump_and_plot_pred_interval is not None
        validation_errors = run_evals(epoch, dump_and_plot)
        if phase == Phases.TRAINING and validation_metric is not None:
            metric = aggregate_val_metric(validation_errors, metric_column=validation_metric)
            if metric < best_validation_metric:
                best_validation_metric = metric
                best_epoch = epoch
                best_params = jax.tree_util.tree_map(np.asarray, params)
                print(f"Updated best validation metric: {best_validation_metric}")
                path = os.path.join(
                    paths.path_to_models_dir(conf, phase, additional_identifiers=additional_identifiers),
                    "best_model.npz",
                )
                save_params(path, params)
        if finetune_dump_model_interval is not None:
            path = os.path.join(
                paths.path_to_models_dir(conf, phase, additional_identifiers=additional_identifiers),
                f"model_epoch{epoch + 1:06d}.npz",
            )
            save_params(path, params)

    # Full train-state checkpointing with mid-run resume — a capability the
    # reference lacks (it saves model weights only; SURVEY section 5).
    ckpt_enabled = conf.get_bool("checkpoint.enabled", default=False)
    ckpt_interval = conf.get_int("checkpoint.interval", default=1000)
    ckpt_keep = conf.get_int("checkpoint.keep", default=3)
    ckpt_resume = conf.get_bool("checkpoint.resume", default=False)
    start_epoch = 0
    total_n_batches = 0
    n_epochs_post_warmup = None if lr_warmup_n_steps > 0 else 0
    if ckpt_enabled:
        from gasfm_tpu.train.state import TrainState, restore_checkpoint, save_checkpoint

        ckpt_dir = os.path.join(
            paths.path_to_models_dir(conf, phase, additional_identifiers=additional_identifiers),
            "train_state",
        )
        if ckpt_resume:
            template = TrainState(
                params=params, opt_state=opt_state,
                # [next_epoch, n_updates, total_n_batches,
                #  n_epochs_post_warmup + 1 (0 encodes None)]. The batch and
                # post-warmup counters MUST resume too: the view-increment
                # curriculum derives curr_n_views from n_epochs_post_warmup
                # and TB step indices derive from total_n_batches — fresh
                # zeros would silently restart the curriculum at 2 views
                # (and overwrite earlier TB rows) while the restored LR
                # schedule continues at its post-curriculum position.
                step=jnp.zeros((4,), jnp.int32),
            )
            restored = restore_checkpoint(ckpt_dir, template)
            if restored is not None:
                params = restored.params
                opt_state = restored.opt_state
                st = np.asarray(restored.step)
                start_epoch = int(st[0])
                n_updates = int(st[1])
                total_n_batches = int(st[2])
                n_epochs_post_warmup = int(st[3]) - 1 if int(st[3]) > 0 else None
                print(f"[checkpoint] resumed at epoch {start_epoch} ({n_updates} updates)")
    final_params = None
    curr_train_loader = train_loader
    # jax.profiler trace window (observability.profile_start_epoch/
    # profile_n_epochs) — the TPU-native upgrade of the reference's
    # wall-clock-only timing (train.py:190-205; SURVEY section 5).
    profiler = ProfilerWindow(conf)

    for epoch in range(start_epoch, n_epochs):
        if phase == Phases.TRAINING:
            scene = None
            curr_train_loader = train_loader
        else:
            scene = conf.get_string("dataset.scene")
            if sequentially_increment_views:
                prev_n_views = curr_n_views
                curr_n_views = (
                    2 + n_epochs_post_warmup // increment_views_interval
                    if n_epochs_post_warmup is not None
                    else 2
                )
                if curr_n_views >= total_n_views:
                    curr_train_loader = train_loader
                elif curr_n_views != prev_n_views:
                    print(f"Updating #views: {prev_n_views} -> {curr_n_views}")
                    subscene = get_subset(fullscene_data, curr_n_views)
                    subscene_ds = ScenesDataSet([subscene], return_all=True)
                    curr_train_loader = SceneLoader(subscene_ds, batch_size=1, shuffle=False)

        profiler.maybe_start(epoch)
        params, opt_state, n_updates, mean_loss, _, n_batches = epoch_train(
            conf, session, curr_train_loader, params, opt_state, n_updates, epoch, phase,
            tb_writer, outlier_injection_rate=outlier_injection_rate,
            additional_identifiers=additional_identifiers + outlier_ids,
            scene=scene, prev_n_batches=total_n_batches,
            tb_log_train_per_scene=tb_log_train_per_scene if phase == Phases.TRAINING else None,
            rng=rng,
        )
        profiler.maybe_stop(epoch)
        total_n_batches += n_batches

        if n_epochs_post_warmup is not None:
            n_epochs_post_warmup += 1
        elif total_n_batches >= lr_warmup_n_steps:
            n_epochs_post_warmup = 0

        if print_interval is not None and epoch % print_interval == 0:
            print(f"{epoch} Train Loss: {mean_loss}")

        if ckpt_enabled and (epoch + 1) % ckpt_interval == 0:
            save_checkpoint(
                ckpt_dir,
                TrainState(
                    params=params, opt_state=opt_state,
                    step=jnp.asarray([
                        epoch + 1, n_updates, total_n_batches,
                        0 if n_epochs_post_warmup is None else n_epochs_post_warmup + 1,
                    ], jnp.int32),
                ),
                step=epoch + 1,
                keep=ckpt_keep,
            )

        if (epoch + 1) % eval_interval == 0 or epoch == 0 or epoch == n_epochs - 1:
            dump_and_plot = (
                finetune_dump_and_plot_pred_interval is not None
                and (epoch + 1) % finetune_dump_and_plot_pred_interval == 0
            )
            validation_errors = run_evals(epoch, dump_and_plot)

            if epoch == n_epochs - 1:
                final_params = jax.tree_util.tree_map(np.asarray, params)

            if phase == Phases.TRAINING and validation_metric is not None:
                metric = aggregate_val_metric(validation_errors, metric_column=validation_metric)
                if epoch == n_epochs - 1:
                    final_validation_metric = metric
                if metric < best_validation_metric:
                    converge_time = time() - begin_time
                    best_validation_metric = metric
                    best_epoch = epoch
                    best_params = jax.tree_util.tree_map(np.asarray, params)
                    print(
                        f"Updated best validation metric: {best_validation_metric} "
                        f"time so far: {converge_time}"
                    )

            if any([
                finetune_dump_model_interval is not None
                and (epoch + 1) % finetune_dump_model_interval == 0,
                phase == Phases.TRAINING and validation_metric is not None and epoch == best_epoch,
            ]):
                path = os.path.join(
                    paths.path_to_models_dir(conf, phase, additional_identifiers=additional_identifiers),
                    f"model_epoch{epoch + 1:06d}.npz",
                )
                save_params(path, params)

    profiler.close()

    if final_params is None:
        final_params = jax.tree_util.tree_map(np.asarray, params)

    trained_params = {"final_model": final_params}
    models_dir = paths.path_to_models_dir(conf, phase, additional_identifiers=additional_identifiers)
    save_params(os.path.join(models_dir, "final_model.npz"), final_params)

    if phase == Phases.TRAINING and validation_metric is not None:
        trained_params["best_model"] = best_params if best_params is not None else final_params
        save_params(os.path.join(models_dir, "best_model.npz"), trained_params["best_model"])
        train_stats = pd.DataFrame([{
            "Convergence time": converge_time,
            "best_epoch": best_epoch + 1,
            "best_validation_metric": best_validation_metric,
            "final_validation_metric": final_validation_metric,
        }])
    else:
        train_stats = get_dummy_train_stats()

    return trained_params, train_stats


def get_dummy_train_stats() -> pd.DataFrame:
    """Parity: reference train.py:693-700."""
    return pd.DataFrame([{
        "Convergence time": float("nan"),
        "best_epoch": float("nan"),
        "best_validation_metric": float("nan"),
        "final_validation_metric": float("nan"),
    }])
