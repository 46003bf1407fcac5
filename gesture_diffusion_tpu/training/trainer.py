"""The training loop: one jitted, donated, mesh-sharded step.

Re-design of the reference Trainer (``models/trainer.py:41-307``):

  * the whole step (timestep draw, q_sample, forward, loss, backward, AdamW
    update, grad-norm) is ONE jitted function with the state donated —
    the reference's hidden syncs (per-parameter ``.item()`` grad norm at
    trainer.py:341-349, host numpy timestep draws at resample.py:58,
    per-step ``loss.item()``) all disappear;
  * data parallelism comes from batch sharding over the mesh's ``data``
    axis with replicated params — XLA inserts the gradient all-reduce;
  * epochs / validation / best-state tracking / early stopping / per-epoch
    checkpointing / resume keep the reference's semantics and artifact
    fields (train_step, epochs_run, best_metric_value, run id).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.gaussian import Schedule
from ..models.denoiser import GestureDenoiser
from ..parallel import make_mesh, replicate, shard_batch
from ..utils.rng import RngStream
from .checkpoint import checkpoint_path, load_checkpoint, save_checkpoint
from .data import ArrayDataset, iter_batches
from .metrics import MetricsLogger, generate_run_id
from .train_state import (
    TrainState,
    assemble_losses,
    clip_gradients,
    init_opt_state,
)


def _inpaint_kwargs(model: GestureDenoiser, poses: jax.Array) -> dict:
    """Seed-pose conditioning tensors for the inpaint variant
    (trainer.py:140-146): first pose_seed_len frames are the visible seed."""
    if model.cfg.model_type != "inpaint":
        return {}
    seed_len = model.cfg.pose_seed_len
    mask = jnp.zeros(poses.shape[:2] + (1,), poses.dtype).at[:, :seed_len].set(1.0)
    return {"inpaint_pose": poses, "inpaint_mask": mask}


def load_start_params(params, start_chkpt: str):
    """Tolerant merge of a checkpoint's best_params into fresh params:
    matching path+shape leaves are copied, everything else keeps its fresh
    init (and is reported), enabling cross-architecture fine-tuning."""
    import flax

    with open(start_chkpt, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    source = raw.get("best_params", raw)
    flat_src = flax.traverse_util.flatten_dict(source)
    flat_dst = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params))
    loaded, new = 0, []
    for key, value in flat_dst.items():
        src = flat_src.get(key)
        if src is not None and np.shape(src) == np.shape(value):
            flat_dst[key] = jnp.asarray(src, jnp.asarray(value).dtype)
            loaded += 1
        else:
            new.append("/".join(key))
    for name in new:
        print(f"[Warning] New param (fresh init): {name}")
    print(f"[Info] Loaded {loaded} tensors from {start_chkpt}")
    return flax.traverse_util.unflatten_dict(flat_dst)


def dedup_local_pairs(per_example_loss, t_np: np.ndarray):
    """This process's (t, loss) pairs from a globally-sharded (N,) loss
    vector, each example exactly ONCE: under DPxTP the vector is sharded
    on "data" but REPLICATED on "model", so ``addressable_shards`` yields
    each data-row range once per model-axis device — inserting the
    duplicates would fill the sampler's per-timestep history at
    model_size x rate and evict real samples early (reference semantics:
    one history entry per example, ``resample.py:91-108``)."""
    local_ts, local_losses, seen = [], [], set()
    n_total = per_example_loss.shape[0]
    for shard in per_example_loss.addressable_shards:
        s = shard.index[0]
        key = (s.start or 0, n_total if s.stop is None else s.stop)
        if key in seen:
            continue
        seen.add(key)
        local_ts.append(t_np[s])
        local_losses.append(np.asarray(shard.data))
    return np.concatenate(local_ts), np.concatenate(local_losses)


def _train_step_body(
    model: GestureDenoiser,
    sched: Schedule,
    optimizer: optax.GradientTransformation,
    loss_params: Optional[Dict[str, float]],
    grad_norm_clip_value: Optional[float] = None,
    grad_clip_value: Optional[float] = None,
    external_timesteps: bool = False,
):
    """:param external_timesteps: take ``(t, weights)`` as extra traced
    arguments instead of drawing t uniformly in-graph — the loss-aware
    schedule sampler (reference ``resample.py:60-108``) keeps mutating
    host-side importance weights, so its draws must happen on the host and
    flow in as data; the step then returns the unweighted per-example mse
    (``metrics["mse_per_example"]``) for the sampler's history update."""

    def train_step(state: TrainState, batch, rng, t=None, weights=None):
        rng = jax.random.fold_in(rng, state.step)
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        poses, wav = batch["pose"], batch["wav"]
        if not external_timesteps:
            t = jax.random.randint(
                t_rng, (poses.shape[0],), 0, sched.num_timesteps)
            weights = None
        noise = jax.random.normal(n_rng, poses.shape, poses.dtype)
        extra = _inpaint_kwargs(model, poses)

        def loss_fn(params):
            mutated = {}

            def model_fn(x_t, tt):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x_t, tt, wav, train=True, mutable=["batch_stats"],
                    rngs={"dropout": d_rng}, **extra)
                mutated["batch_stats"] = mut["batch_stats"]
                return out

            losses = assemble_losses(sched, model_fn, poses, t, noise,
                                     loss_params, weights=weights,
                                     with_per_example=external_timesteps)
            return losses["loss"], (losses, mutated["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # Optimizer tail on ONE ravelled vector: per-leaf norm/clip/update
        # ops cost ~2.5 us each on-device and this model has ~360 leaves —
        # the per-leaf global_norm alone measured 8.1 ms of a 25 ms step
        # (XLA Ops trace, PERF.md round 3).  AdamW is elementwise so the
        # flat math is bit-equivalent; new params are rebuilt by adding
        # the unravelled update to the param TREE so sharding (e.g. TP)
        # propagates from the old leaves.
        from jax.flatten_util import ravel_pytree

        flat_grads, unravel = ravel_pytree(grads)
        grad_norm = jnp.linalg.norm(flat_grads)
        flat_grads = clip_gradients(flat_grads, grad_norm_clip_value,
                                    grad_clip_value)
        flat_params, _ = ravel_pytree(state.params)
        flat_updates, opt_state = optimizer.update(
            flat_grads, state.opt_state, flat_params)
        params = jax.tree.map(jnp.add, state.params, unravel(flat_updates))
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        metrics = dict(losses)
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    return train_step


def make_train_step(
    model: GestureDenoiser,
    sched: Schedule,
    optimizer: optax.GradientTransformation,
    loss_params: Optional[Dict[str, float]],
    grad_norm_clip_value: Optional[float] = None,
    grad_clip_value: Optional[float] = None,
    external_timesteps: bool = False,
):
    body = _train_step_body(model, sched, optimizer, loss_params,
                            grad_norm_clip_value, grad_clip_value,
                            external_timesteps=external_timesteps)
    return jax.jit(body, donate_argnums=(0,))


def make_train_multi_step(
    model: GestureDenoiser,
    sched: Schedule,
    optimizer: optax.GradientTransformation,
    loss_params: Optional[Dict[str, float]],
    grad_norm_clip_value: Optional[float] = None,
    grad_clip_value: Optional[float] = None,
):
    """K training steps per dispatch: one jitted ``lax.scan`` over a
    leading steps axis of stacked batches ({"pose": (K, N, T, C), "wav":
    (K, N, T_wav)}) with the state as donated carry.

    Numerically equivalent to K successive ``make_train_step`` calls with
    the same ``rng``: the per-step RNG stream is identical by construction
    (``state.step`` is folded into the rng inside the body), but the two
    programs compile conv gradients with different reduction orders, so
    params agree to float noise (~1e-4 after Adam's g/sqrt(v), see
    tests/test_training.py::TestMultiStep) — NOT bit-exactly.  Pays the
    per-program dispatch/launch cost once per K steps instead of per step — measured ~22 ms/step of
    non-compute overhead on the tunnel-attached dev chip (PERF.md round 3).
    Returns (state, metrics) with each metric stacked to (K,).
    """
    body = _train_step_body(model, sched, optimizer, loss_params,
                            grad_norm_clip_value, grad_clip_value)

    def multi_step(state: TrainState, batches, rng):
        def scan_body(carry, batch):
            new_state, metrics = body(carry, batch, rng)
            return new_state, metrics

        return jax.lax.scan(scan_body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_val_step(
    model: GestureDenoiser,
    sched: Schedule,
    loss_params: Optional[Dict[str, float]],
):
    def val_step(state: TrainState, batch, rng):
        t_rng, n_rng = jax.random.split(rng)
        poses, wav = batch["pose"], batch["wav"]
        t = jax.random.randint(t_rng, (poses.shape[0],), 0, sched.num_timesteps)
        noise = jax.random.normal(n_rng, poses.shape, poses.dtype)
        extra = _inpaint_kwargs(model, poses)

        def model_fn(x_t, tt):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x_t, tt, wav, train=False, **extra)

        return assemble_losses(sched, model_fn, poses, t, noise, loss_params)

    return jax.jit(val_step)


class Trainer:
    def __init__(
        self,
        model: GestureDenoiser,
        sched: Schedule,
        optimizer: optax.GradientTransformation,
        lr_schedule,
        train_dataset: ArrayDataset,
        val_dataset: ArrayDataset,
        batch_size: int,
        log_dir: str,
        seed: int = 0,
        metric: str = "val_loss",
        goal: str = "minimize",
        loss_params: Optional[Dict[str, float]] = None,
        grad_norm_clip_value: Optional[float] = None,
        grad_clip_value: Optional[float] = None,
        log_step_gap: int = 100,
        mesh=None,
        config: Optional[dict] = None,
        start_chkpt: Optional[str] = None,
        steps_per_call: int = 1,
        schedule_sampler: Optional[str] = None,
    ):
        """:param start_chkpt: fine-tuning — initialise params from another
        run's best weights where tree paths/shapes match, keeping fresh
        inits elsewhere (reference ``model_creation.py:164-177``; its
        10x-lr-for-new-params optimizer was dead code, overwritten at :179,
        so the operational behaviour is a plain optimizer — matched here).
        :param schedule_sampler: ``None``/``"uniform"`` (default — in-graph
        uniform t draw) or ``"loss-second-moment"``: importance-sample
        timesteps by RMS of recent per-t losses (reference
        ``resample.py:60-108``), drawing t host-side each step and feeding
        the per-example losses back into the sampler history (allgathered
        across hosts so every process keeps the identical history).  Costs
        one host<->device round trip per step; incompatible with
        ``steps_per_call > 1`` (the scan cannot surface per-step losses to
        the host mid-program)."""
        assert goal in ("minimize", "maximize"), f"Unsupported goal: {goal}"
        self.model = model
        self.sched = sched
        self.optimizer = optimizer
        self.lr_schedule = lr_schedule
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.batch_size = batch_size
        self.log_dir = log_dir
        self.seed = seed
        self.metric = metric
        self.goal = goal
        self.loss_params = dict(loss_params) if loss_params else None
        self.log_step_gap = log_step_gap
        self.mesh = mesh if mesh is not None else make_mesh()
        self.rngs = RngStream(seed)

        self.sampler = None
        if schedule_sampler not in (None, "uniform"):
            from ..diffusion.resample import create_named_schedule_sampler

            if steps_per_call > 1:
                raise ValueError(
                    f"schedule_sampler={schedule_sampler!r} requires "
                    "steps_per_call=1: the loss-aware sampler needs the "
                    "per-step losses on the host between steps")
            self.sampler = create_named_schedule_sampler(
                schedule_sampler, sched.num_timesteps)
            # NOTE not checkpointed (the reference keeps it in-memory only
            # too); a resume restarts the history warm-up from scratch
            self._sampler_rng = self.rngs.numpy("schedule_sampler")
            # dedup_local_pairs dedups replicated data-row ranges WITHIN a
            # process; if the model axis crossed hosts, each host would
            # contribute its replicated ranges once and the allgather
            # would enter every example model_size times — refuse the
            # layout up front rather than silently skewing the history
            if jax.process_count() > 1 and "model" in self.mesh.shape \
                    and self.mesh.shape["model"] > 1:
                ax = self.mesh.axis_names.index("model")
                rows = np.moveaxis(self.mesh.devices, ax, -1)
                for row in rows.reshape(-1, rows.shape[-1]):
                    if len({d.process_index for d in row}) != 1:
                        raise ValueError(
                            "schedule_sampler with a multi-host 'model' "
                            "mesh axis: the model axis must not span "
                            "processes (per-example loss dedup is "
                            "per-process; see dedup_local_pairs)")

        self._train_step = make_train_step(
            model, sched, optimizer, self.loss_params,
            grad_norm_clip_value, grad_clip_value,
            external_timesteps=self.sampler is not None)
        # steps_per_call > 1: scan K steps inside one program (per-dispatch
        # overhead paid once per K; same numerics as K single steps).
        # Multihost: every host holds the full dataset, so the multi path
        # collects FULL GLOBAL batches (iter_batches with process_count=1 —
        # identical on all hosts via the shared shuffle seed) and
        # jax.device_put shards the host-replicated K-stack onto the global
        # (None, "data") sharding; validated for real in
        # tests/test_multiprocess.py (2 jax.distributed processes).
        self.steps_per_call = max(1, int(steps_per_call))
        if self.steps_per_call > 1 and self.mesh is not None \
                and batch_size % self.mesh.shape["data"]:
            # the multi-step path assembles batches with iter_batches(mesh=
            # None) and shards the K-stack itself — surface the divisibility
            # misconfiguration here with iter_batches' message, not later as
            # an opaque device_put sharding error inside _flush_multi
            raise ValueError(
                f"batch_size {batch_size} not divisible by the mesh data "
                f"axis {self.mesh.shape['data']}")
        if self.steps_per_call > 1 and jax.process_count() > 1:
            # the multi-step path ASSUMES every host holds a bit-identical
            # dataset + shuffle seed (device_put of host-replicated stacks
            # uses each host's local bytes for its addressable shards —
            # divergent hosts would silently produce inconsistent global
            # batches).  Verify with a cheap cross-host checksum: seed +
            # shapes/dtypes + a 64-row stride sample of every array.
            import zlib

            from jax.experimental import multihost_utils

            h = zlib.crc32(np.asarray([self.seed]).tobytes())
            for k in sorted(train_dataset.data):
                v = np.ascontiguousarray(train_dataset.data[k])
                h = zlib.crc32(repr((k, v.shape, str(v.dtype))).encode(), h)
                h = zlib.crc32(v[:: max(1, v.shape[0] // 64)].tobytes(), h)
            all_h = np.asarray(multihost_utils.process_allgather(
                np.asarray(h, np.int64)))
            if len({int(x) for x in all_h.ravel()}) != 1:
                raise ValueError(
                    "steps_per_call > 1 multihost requires an identical "
                    "train dataset and seed on every host; cross-host "
                    f"checksums differ: {all_h.ravel().tolist()}")
        self._train_multi = (make_train_multi_step(
            model, sched, optimizer, self.loss_params,
            grad_norm_clip_value, grad_clip_value)
            if self.steps_per_call > 1 else None)
        self._val_step = make_val_step(model, sched, self.loss_params)

        # ---- init or resume -------------------------------------------------
        self.chkpt_path = checkpoint_path(log_dir, seed)
        sample = {k: v[: max(2, self.mesh.shape["data"])]
                  for k, v in train_dataset.data.items()}
        variables = model.init(
            self.rngs.key("init"),
            jnp.asarray(sample["pose"]), jnp.zeros((len(sample["pose"]),), jnp.int32),
            jnp.asarray(sample["wav"]), train=False,
            **_inpaint_kwargs(model, jnp.asarray(sample["pose"])))
        params = variables["params"]
        if start_chkpt is not None and not os.path.exists(
                checkpoint_path(log_dir, seed)):
            params = load_start_params(params, start_chkpt)
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(params, batch_stats,
                           init_opt_state(optimizer, params),
                           jnp.asarray(0, jnp.int32))
        self.best_params = params
        self.epochs_run = 0
        self.best_metric_value = np.inf if goal == "minimize" else -np.inf
        self.run_id = generate_run_id()

        if os.path.exists(self.chkpt_path):
            tree, meta = load_checkpoint(self.chkpt_path, {
                "state": state, "best_params": params})
            state = tree["state"]
            self.best_params = tree["best_params"]
            self.epochs_run = meta.get("epochs_run", 0)
            self.best_metric_value = meta.get("best_metric_value", self.best_metric_value)
            self.run_id = meta.get("run_id", self.run_id)
            print(f"[Info] Resuming from {self.chkpt_path} at epoch {self.epochs_run}")

        self.state = TrainState(*replicate(tuple(state), self.mesh))
        # host-side mirror of state.step: avoids a device sync per batch
        self._step = int(jax.device_get(state.step))
        self.logger = MetricsLogger(log_dir, run_id=self.run_id, config=config)
        if config is not None:
            import json

            with open(os.path.join(log_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

        self.early_stop_counter = 0
        self.early_stop = False

    # ------------------------------------------------------------------
    @property
    def train_step_count(self) -> int:
        return self._step

    def save(self) -> None:
        save_checkpoint(
            self.chkpt_path,
            {"state": self.state, "best_params": self.best_params},
            {
                "train_step": self.train_step_count,
                "epochs_run": self.epochs_run,
                "best_metric_value": float(self.best_metric_value),
                "run_id": self.run_id,
            },
        )

    def _log_train(self, step: int, metrics, idx: Optional[int] = None) -> None:
        if step % self.log_step_gap:
            return
        record = {f"train/{k}": float(jax.device_get(
            v if idx is None else v[idx])) for k, v in metrics.items()}
        record["train/step"] = step
        record["train/lr"] = float(self.lr_schedule(step))
        self.logger.log(record, step=step)

    def _run_train_epoch(self) -> None:
        rng = self.rngs.key("train")
        data_rng = self.rngs.numpy("shuffle", self.epochs_run)
        multi = self.steps_per_call > 1
        pending = []
        # multi-step: collect FULL GLOBAL batches (host-replicated data +
        # shared shuffle seed make them identical on every host) and shard
        # the K-stack in one placement (dims (K, N, ...), batch axis
        # sharded over the global mesh)
        multi_kwargs = ({"process_count": 1, "process_index": 0}
                        if multi else {})
        for batch in iter_batches(self.train_dataset, self.batch_size,
                                  rng=data_rng,
                                  mesh=None if multi else self.mesh,
                                  **multi_kwargs):
            if multi:
                pending.append(batch)
                if len(pending) == self.steps_per_call:
                    self._flush_multi(pending, rng)
                    pending = []
                continue
            step = self._step
            self.state, metrics = self._dispatch_step(batch, rng)
            self._step += 1
            self._log_train(step, metrics)
        # a short tail runs through the single-step path (same numerics)
        for batch in pending:
            step = self._step
            self.state, metrics = self._dispatch_step(
                shard_batch(batch, self.mesh), rng)
            self._step += 1
            self._log_train(step, metrics)

    def _dispatch_step(self, batch, rng):
        """One train step; with a loss-aware sampler active, draw t on the
        host, feed (t, weights) in, and feed the per-example losses back."""
        if self.sampler is None:
            return self._train_step(self.state, batch, rng)
        t_np, w_np = self.sampler.sample_np(
            self._sampler_rng, int(batch["pose"].shape[0]))
        state, metrics = self._train_step(
            self.state, batch, rng, jnp.asarray(t_np), jnp.asarray(w_np))
        self._update_sampler(t_np, metrics.pop("mse_per_example"))
        return state, metrics

    def _update_sampler(self, t_np: np.ndarray, per_example_loss) -> None:
        """Sampler history update, reference ``resample.py:91-108``.

        Multihost: the (N,) per-example loss vector is globally sharded —
        each process reads only its addressable shards and pairs them with
        the matching rows of t (host-computed, so every host knows the full
        vector); ``update_with_local_losses`` then allgathers the pairs so
        every host applies the identical global history update, keeping
        weights — and the next host-side draw — in lockstep."""
        if jax.process_count() == 1:
            losses = np.asarray(jax.device_get(per_example_loss))
            self.sampler.update_with_local_losses(t_np, losses)
            return
        local_ts, local_losses = dedup_local_pairs(per_example_loss, t_np)
        self.sampler.update_with_local_losses(local_ts, local_losses)

    def _flush_multi(self, batches, rng) -> None:
        from jax.sharding import NamedSharding, PartitionSpec

        stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
                   for k in batches[0]}
        # __init__ guarantees self.mesh (falls back to make_mesh())
        s = NamedSharding(self.mesh, PartitionSpec(None, "data"))
        stacked = {k: jax.device_put(v, s) for k, v in stacked.items()}
        first = self._step
        self.state, metrics = self._train_multi(self.state, stacked, rng)
        self._step += len(batches)
        for i in range(len(batches)):
            self._log_train(first + i, metrics, idx=i)

    def _run_val_epoch(self) -> float:
        rng = self.rngs.key("val", self.epochs_run)
        sums: Dict[str, float] = {}
        n_batches = 0
        for batch in iter_batches(self.val_dataset, self.batch_size,
                                  shuffle=False, mesh=self.mesh):
            # fresh timestep/noise draws per batch (the reference draws per
            # batch too, resample.py:58); folding only per epoch would give
            # the epoch estimator one batch's worth of timestep coverage
            losses = self._val_step(self.state, batch,
                                    jax.random.fold_in(rng, n_batches))
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(jax.device_get(v))
            n_batches += 1
        means = {k: v / max(1, n_batches) for k, v in sums.items()}
        record = {f"val/{k}": v for k, v in means.items()}
        record["val/epochs_run"] = self.epochs_run
        metric_value = record[self.metric.replace("_", "/", 1)]
        record[self.metric] = metric_value
        self.logger.log(record, step=self.train_step_count)
        return metric_value

    def _update_best(self, metric_value: float, early_stop_threshold: int) -> None:
        improved = (metric_value < self.best_metric_value
                    if self.goal == "minimize"
                    else metric_value > self.best_metric_value)
        if improved:
            # deep-copy: state buffers are donated to the next train_step
            self.best_params = jax.tree.map(jnp.copy, self.state.params)
            self.best_metric_value = metric_value
            self.early_stop_counter = 0
        else:
            self.early_stop_counter += 1
            if self.early_stop_counter >= early_stop_threshold:
                self.early_stop = True
                print("[Info] Early stop threshold reached. Stop training.")

    def train(self, max_epochs: int, early_stop_threshold: int = 10**9) -> None:
        for _ in range(self.epochs_run, max_epochs):
            st = time.time()
            self._run_train_epoch()
            metric_value = self._run_val_epoch()
            self.epochs_run += 1
            self._update_best(metric_value, early_stop_threshold)
            self.save()
            print(
                f"[Info] Epoch {self.epochs_run}/{max_epochs}"
                f" | step {self.train_step_count}"
                f" | {self.metric} {metric_value:.6f}"
                f" | best {self.best_metric_value:.6f}"
                f" | early-stop {self.early_stop_counter}/{early_stop_threshold}"
                f" | {time.time() - st:.2f}s"
            )
            if self.early_stop:
                break
