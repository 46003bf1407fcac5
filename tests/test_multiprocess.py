"""REAL multi-process SPMD integration: two jax.distributed CPU processes
(2 local devices each -> one 4-device global mesh) exercising the paths the
rest of the suite can only simulate single-process with injected gathers /
process_count arguments:

  * ``LossSecondMomentResampler.update_with_local_losses`` with the real
    ``multihost_utils.process_allgather`` — per-host histories must come out
    bit-identical and equal to the global update (reference
    ``resample.py:91-108`` semantics);
  * ``iter_batches(mesh=...)`` multihost batch assembly + one
    ``make_train_step`` DP train step on the global mesh — both processes
    must see the same finite loss, equal to a single-process run of the
    identical batch.

Workers are spawned as subprocesses (coordinator on a dynamically-bound
free port); each prints machine-checkable lines the parent asserts on.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json
import os
import sys

import numpy as np

proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# NO persistent compile cache here, deliberately: XLA:CPU AOT cache
# entries fail to reload on this host ("machine features mismatch ...
# +prefer-no-gather"), so a warm cache makes each rank churn through
# failed loads at different points and the ranks skew past Gloo's
# hardcoded 30 s GetKeyValue rendezvous window (measured flake).  With
# no cache both ranks do identical compile work and stay in step.
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
# go through the PUBLIC multi-host entry point (parallel.init_distributed,
# the reference's init_process_group replacement) so it is what the real
# 2-process validation exercises, not a test-only direct initialize
from gesture_diffusion_tpu.parallel import init_distributed
assert init_distributed(coordinator_address=f"localhost:{port}",
                        num_processes=2, process_id=proc_id,
                        local_device_ids=[0, 1]) == proc_id
import jax.numpy as jnp
import optax

from gesture_diffusion_tpu.diffusion import make_schedule, linear_betas
from gesture_diffusion_tpu.diffusion.resample import LossSecondMomentResampler
from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
from gesture_diffusion_tpu.parallel import make_mesh, replicate
from gesture_diffusion_tpu.training import (ArrayDataset, TrainState,
                                            init_opt_state, make_train_step)
from gesture_diffusion_tpu.training.data import iter_batches

# --- 1. history sync through the REAL process_allgather ------------------
s = LossSecondMomentResampler(4, history_per_term=2)
ts = np.asarray([proc_id, proc_id + 2], np.int32)
losses = np.asarray([1.0 + proc_id, 3.0 + proc_id], np.float32)
s.update_with_local_losses(ts, losses)
print("HIST " + json.dumps({"p": proc_id,
                            "hist": s._loss_history.tolist(),
                            "counts": s._loss_counts.tolist()}), flush=True)

# --- 2. multihost batch assembly + one DP train step ---------------------
rng = np.random.default_rng(0)
data = {"wav": rng.normal(0, 0.3, (8, 8000)).astype(np.float32),
        "pose": rng.normal(size=(8, 6, 6)).astype(np.float32)}
mesh = make_mesh()                       # 4 global devices, data axis 4
model = GestureDenoiser(DenoiserConfig(d_pose=6, d_model=32, heads=4,
                                       n_layers=1, dropout=0.0))
batch = next(iter_batches(ArrayDataset(data), 8, shuffle=False, mesh=mesh))
variables = model.init(jax.random.key(0),
                       jnp.asarray(data["pose"][:2]),
                       jnp.zeros((2,), jnp.int32),
                       jnp.asarray(data["wav"][:2]), train=False)
optimizer = optax.adamw(1e-3)
params = replicate(variables["params"], mesh)
state = TrainState(params, replicate(variables.get("batch_stats", {}), mesh),
                   init_opt_state(optimizer, params),
                   jnp.asarray(0, jnp.int32))
sched = make_schedule(linear_betas(20))
step = make_train_step(model, sched, optimizer, None)
state2, metrics = step(state, batch, jax.random.key(1))
jax.block_until_ready(metrics)
print("LOSS " + json.dumps({"p": proc_id,
                            "loss": float(jax.device_get(metrics["loss"])),
                            "n_dev": len(jax.devices()),
                            "n_local": len(jax.local_devices())}),
      flush=True)

# --- 3. loss-aware sampler LOOP in lockstep across real processes --------
# (the full Trainer._dispatch_step cycle: host draw -> external-timesteps
# step -> sharded per-example losses -> dedup -> REAL allgather -> history)
from gesture_diffusion_tpu.training.trainer import dedup_local_pairs

sampler = LossSecondMomentResampler(20, history_per_term=10)
sampler_rng = np.random.default_rng(123)   # same seed -> lockstep draws
step_ext = make_train_step(model, sched, optimizer, None,
                           external_timesteps=True)
state_s = state2
for i in range(3):
    t_np, w_np = sampler.sample_np(sampler_rng, 8)
    state_s, m = step_ext(state_s, batch, jax.random.fold_in(
        jax.random.key(2), i), jnp.asarray(t_np), jnp.asarray(w_np))
    local_ts, local_losses = dedup_local_pairs(m["mse_per_example"], t_np)
    sampler.update_with_local_losses(local_ts, local_losses)
print("SAMP " + json.dumps({"p": proc_id,
                            "counts": sampler._loss_counts.tolist(),
                            "hist_sum": float(sampler._loss_history.sum()),
                            "w": sampler.weights().tolist()}), flush=True)

# --- 4. full Trainer epoch with steps_per_call=2 on the 2-host mesh ------
# (the K-stack path: full-global batch collection + host-replicated
# device_put onto the global sharding; val epoch uses the real
# make_array_from_single_device_arrays assembly)
import tempfile

from gesture_diffusion_tpu.training import Trainer

rng2 = np.random.default_rng(77)   # same seed on both hosts

data16 = {"wav": rng2.normal(0, 0.3, (16, 8000)).astype(np.float32),
          "pose": rng2.normal(size=(16, 6, 6)).astype(np.float32)}
trainer = Trainer(model, sched, optax.adamw(1e-3), lambda s: 1e-3,
                  ArrayDataset(data16), ArrayDataset(data16), batch_size=8,
                  log_dir=tempfile.mkdtemp(prefix=f"mh{proc_id}_"),
                  seed=0, mesh=mesh, steps_per_call=2, log_step_gap=1)
trainer.train(max_epochs=1)
flat = np.concatenate([np.ravel(np.asarray(x))
                       for x in jax.tree.leaves(
                           jax.device_get(trainer.state.params))])
print("TRAIN " + json.dumps({"p": proc_id,
                             "steps": trainer.train_step_count,
                             "best": float(trainer.best_metric_value),
                             "psum": float(np.float64(flat).sum())}),
      flush=True)

# --- 5. sharded generate_sample on the global mesh (eval path) -----------
# (reference eval loop main.py:193-203: sample a batch, score it; here the
# batch is sharded over the 2-host data axis and every host must see the
# same full output)
from jax.experimental import multihost_utils

from gesture_diffusion_tpu.diffusion import make_diffusion
from gesture_diffusion_tpu.generation import Generator
from gesture_diffusion_tpu.parallel import data_sharding

eval_sched, eval_tmap = make_diffusion("linear", 20, "ddim4",
                                       is_training=False)
# state_s, not state2: the section-3 loop DONATED state2 into step_ext,
# deleting its buffers (make_train_step donates its input state)
gen = Generator(model, {"params": state_s.params,
                        "batch_stats": state_s.batch_stats},
                eval_sched, jnp.asarray(eval_tmap))
wavs_g = jax.device_put(data["wav"], data_sharding(mesh))
sample = gen.generate_sample(wavs_g, 6, 6, jax.random.key(9))
jax.block_until_ready(sample)
full = np.asarray(multihost_utils.process_allgather(sample, tiled=True))
print("GEN " + json.dumps({"p": proc_id, "shape": list(full.shape),
                           "finite": bool(np.isfinite(full).all()),
                           "csum": float(np.float64(full).sum())}),
      flush=True)

# --- 6. GestureStream window over the global mesh -------------------------
# (streaming service sharded over hosts: both processes push the SAME
# audio; emitted chunks are host-gathered full batches)
stream = gen.stream(16000, 6, 20, pose_window_len=6, pose_seed_len=2,
                    rng=jax.random.key(10), mesh=mesh)
# 1.0 s of audio (the plan truncates to whole seconds): 20 frames over
# 5 windows of 6 frames / stride 4
wav_s = np.concatenate([data["wav"], data["wav"]], axis=1)
chunks = stream.push(wav_s[:, :9000])
chunks += stream.push(wav_s[:, 9000:])
chunks += stream.flush()
seq = np.concatenate(chunks, axis=1)
print("STREAM " + json.dumps({"p": proc_id, "shape": list(seq.shape),
                              "finite": bool(np.isfinite(seq).all()),
                              "csum": float(np.float64(seq).sum())}),
      flush=True)
""" % {"repo": REPO}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_spmd_history_sync_and_train_step(tmp_path):
    # Bounded by the workers' communicate(timeout=...) below (no
    # pytest-timeout dependency here).  Round 4's 540 s cap had only ~20%
    # headroom over the ~435 s measured cold single-run time on this
    # 1-core host and went red under full-suite contention; the bound is
    # now ~3x measured-cold and the conftest orders this test LAST so
    # the suite never runs it concurrently.  (A persistent worker compile
    # cache was tried and reverted: unloadable CPU AOT entries skewed the
    # ranks past Gloo's 30 s rendezvous — see the note in _WORKER.)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS",
                        "JAX_COMPILATION_CACHE_DIR")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1800)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    hists, the_losses, samp, trained = {}, {}, {}, {}
    gen, streamed = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("HIST "):
                rec = json.loads(line[5:])
                hists[rec["p"]] = rec
            elif line.startswith("LOSS "):
                rec = json.loads(line[5:])
                the_losses[rec["p"]] = rec
            elif line.startswith("SAMP "):
                rec = json.loads(line[5:])
                samp[rec["p"]] = rec
            elif line.startswith("TRAIN "):
                rec = json.loads(line[6:])
                trained[rec["p"]] = rec
            elif line.startswith("GEN "):
                rec = json.loads(line[4:])
                gen[rec["p"]] = rec
            elif line.startswith("STREAM "):
                rec = json.loads(line[7:])
                streamed[rec["p"]] = rec
    assert set(hists) == {0, 1} and set(the_losses) == {0, 1}
    assert set(samp) == {0, 1} and set(trained) == {0, 1}
    assert set(gen) == {0, 1} and set(streamed) == {0, 1}

    # sharded generate_sample (eval path) over the 2-host data axis:
    # finite full batch, identical across hosts after the allgather
    assert gen[0]["shape"] == [8, 6, 6]
    assert gen[0]["finite"] and gen[1]["finite"]
    assert gen[0]["csum"] == pytest.approx(gen[1]["csum"], rel=1e-9)

    # one GestureStream sequence over the global mesh: 1.0 s of audio at
    # window 6 / seed 2 -> 20 frames over 5 windows (window_plan), emitted
    # as host-gathered full batches, identical on both hosts
    assert streamed[0]["shape"] == [8, 20, 6]
    assert streamed[0]["finite"] and streamed[1]["finite"]
    assert streamed[0]["csum"] == pytest.approx(streamed[1]["csum"], rel=1e-9)

    # full Trainer epoch with steps_per_call=2 on the real 2-host mesh:
    # identical step counts, val metric, and final-parameter checksum
    assert trained[0]["steps"] == trained[1]["steps"] == 2   # 16 rows / b8
    assert np.isfinite(trained[0]["best"])
    assert trained[0]["best"] == pytest.approx(trained[1]["best"], rel=1e-6)
    assert trained[0]["psum"] == pytest.approx(trained[1]["psum"], rel=1e-9)

    # the full loss-aware sampler loop stayed in lockstep across the two
    # real processes: identical histories/weights, and each of the 3 steps
    # inserted every example exactly ONCE (8 examples x 3 steps = 24
    # history entries at cap 10/bin over 20 bins — a replicated-shard
    # dedup failure would double them)
    for key in ("counts", "hist_sum", "w"):
        assert samp[0][key] == samp[1][key], (key, samp)
    assert sum(samp[0]["counts"]) == 24

    # per-host histories identical AND equal to the known global update:
    # p0 contributed (t=0, 1.0), (t=2, 3.0); p1 (t=1, 2.0), (t=3, 4.0)
    assert hists[0]["hist"] == hists[1]["hist"]
    assert hists[0]["counts"] == [1, 1, 1, 1]
    got = [row[0] for row in hists[0]["hist"]]
    assert got == [1.0, 2.0, 3.0, 4.0]

    # both processes computed the same global train-step loss on the
    # 2-host x 2-device mesh...
    assert the_losses[0]["n_dev"] == 4 and the_losses[0]["n_local"] == 2
    l0, l1 = the_losses[0]["loss"], the_losses[1]["loss"]
    assert np.isfinite(l0)
    assert l0 == pytest.approx(l1, rel=1e-6)

    # ...equal (to reduction-order noise) to a single-process run of the
    # identical batch on this process's virtual 8-device mesh
    import jax
    import jax.numpy as jnp
    import optax

    from gesture_diffusion_tpu.diffusion import linear_betas, make_schedule
    from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
    from gesture_diffusion_tpu.parallel import make_mesh, replicate, shard_batch
    from gesture_diffusion_tpu.training import (TrainState, init_opt_state,
                                                make_train_step)

    rng = np.random.default_rng(0)
    data = {"wav": rng.normal(0, 0.3, (8, 8000)).astype(np.float32),
            "pose": rng.normal(size=(8, 6, 6)).astype(np.float32)}
    mesh = make_mesh()
    model = GestureDenoiser(DenoiserConfig(d_pose=6, d_model=32, heads=4,
                                           n_layers=1, dropout=0.0))
    batch = shard_batch(data, mesh)
    variables = model.init(jax.random.key(0),
                           jnp.asarray(data["pose"][:2]),
                           jnp.zeros((2,), jnp.int32),
                           jnp.asarray(data["wav"][:2]), train=False)
    optimizer = optax.adamw(1e-3)
    params = replicate(variables["params"], mesh)
    state = TrainState(params,
                       replicate(variables.get("batch_stats", {}), mesh),
                       init_opt_state(optimizer, params),
                       jnp.asarray(0, jnp.int32))
    step = make_train_step(model, sched := make_schedule(linear_betas(20)),
                           optimizer, None)
    _, metrics = step(state, batch, jax.random.key(1))
    expected = float(jax.device_get(metrics["loss"]))
    assert l0 == pytest.approx(expected, rel=1e-4)
