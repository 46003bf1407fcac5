"""Training-loop tests on the virtual 8-device CPU mesh: loss goes down on a
synthetic dataset, checkpoints resume exactly, early stopping fires, and
the lr schedules match the reference's torch scheduler values."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
from gesture_diffusion_tpu.diffusion import make_schedule, linear_betas
from gesture_diffusion_tpu.parallel import make_mesh
from gesture_diffusion_tpu.training import (
    ArrayDataset,
    Trainer,
    TrainState,
    build_lr_schedule,
    init_opt_state,
    make_train_step,
    noam_xf_schedule,
    wasserstein_distance_1d,
)
from gesture_diffusion_tpu.utils import JsonConfig


def synthetic_dataset(n=32, t_pose=10, d_pose=12, t_wav=8000, seed=0):
    """Poses correlated with the wav so there is signal to learn."""
    rng = np.random.default_rng(seed)
    wav = rng.normal(0, 0.5, (n, t_wav)).astype(np.float32)
    base = wav[:, ::t_wav // (t_pose * d_pose)][:, : t_pose * d_pose]
    pose = 0.8 * base.reshape(n, t_pose, d_pose) + 0.1 * rng.normal(size=(n, t_pose, d_pose))
    return ArrayDataset({"wav": wav, "pose": pose.astype(np.float32)})


@pytest.fixture(scope="module")
def small_setup():
    cfg = DenoiserConfig(d_pose=12, d_model=32, heads=4, n_layers=1, dropout=0.0)
    model = GestureDenoiser(cfg)
    sched = make_schedule(linear_betas(50))
    return model, sched


def _make_trainer(model, sched, tmp, seed=0, lr=3e-4, batch_size=16, **kw):
    train_ds = synthetic_dataset(seed=0)
    val_ds = synthetic_dataset(n=16, seed=1)
    optimizer = optax.adamw(lr)
    return Trainer(
        model, sched, optimizer, lambda s: lr,
        train_ds, val_ds, batch_size=batch_size,
        log_dir=str(tmp), seed=seed, mesh=make_mesh(), **kw)


class TestTrainer:
    def test_loss_decreases(self, small_setup, tmp_path):
        model, sched = small_setup
        trainer = _make_trainer(model, sched, tmp_path / "run1", log_step_gap=1)
        trainer.train(max_epochs=8)
        records = trainer.logger.read_all()
        train_losses = [r["train/loss"] for r in records if "train/loss" in r]
        assert len(train_losses) >= 8
        assert train_losses[-1] < train_losses[0] * 0.9
        val_losses = [r["val/loss"] for r in records if "val/loss" in r]
        assert all(np.isfinite(v) for v in val_losses)

    def test_checkpoint_resume_is_exact(self, small_setup, tmp_path):
        model, sched = small_setup
        # run 4 epochs straight
        t_a = _make_trainer(model, sched, tmp_path / "a")
        t_a.train(max_epochs=4)
        # run 2 epochs, "crash", resume to 4
        t_b = _make_trainer(model, sched, tmp_path / "b")
        t_b.train(max_epochs=2)
        t_b2 = _make_trainer(model, sched, tmp_path / "b")
        assert t_b2.epochs_run == 2
        assert t_b2.train_step_count == t_b.train_step_count
        t_b2.train(max_epochs=4)
        flat_a = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
            jax.device_get(t_a.state.params))])
        flat_b = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
            jax.device_get(t_b2.state.params))])
        np.testing.assert_allclose(flat_a, flat_b, atol=1e-6)

    def test_early_stopping(self, small_setup, tmp_path):
        model, sched = small_setup
        trainer = _make_trainer(model, sched, tmp_path / "es", lr=0.0)
        trainer.train(max_epochs=50, early_stop_threshold=2)
        # lr=0: no improvement after the first epoch -> stops at epoch 3
        assert trainer.early_stop
        assert trainer.epochs_run <= 4

    def test_speed_losses_run(self, small_setup, tmp_path):
        model, sched = small_setup
        trainer = _make_trainer(
            model, sched, tmp_path / "sl", log_step_gap=1,
            loss_params={"speed_loss": 0.1, "speed_l1_loss": 0.1,
                         "speed_constraint_loss": 0.01})
        trainer.train(max_epochs=1)
        rec = [r for r in trainer.logger.read_all() if "train/speed" in r][0]
        for key in ("train/speed", "train/speed_l1", "train/speed_constraint"):
            assert np.isfinite(rec[key])

    def test_val_rng_fresh_per_batch(self, small_setup, tmp_path):
        """Regression: every val batch must get its own timestep/noise RNG
        (batch index folded in) — the reference draws per batch too
        (resample.py:58).  An epoch-constant rng would shrink the val
        estimator's timestep coverage to one batch's worth."""
        model, sched = small_setup
        trainer = _make_trainer(model, sched, tmp_path / "valrng")
        seen = []
        orig = trainer._val_step

        def spy(state, batch, rng):
            seen.append(np.asarray(jax.random.key_data(rng)).tolist())
            return orig(state, batch, rng)

        trainer._val_step = spy
        trainer._run_val_epoch()
        assert len(seen) == 1  # 16-sample val set / batch 16
        trainer.batch_size = 8
        seen.clear()
        trainer._run_val_epoch()
        assert len(seen) == 2
        assert seen[0] != seen[1]

    def test_grad_clipping_paths(self, small_setup, tmp_path):
        model, sched = small_setup
        trainer = _make_trainer(
            model, sched, tmp_path / "gc", log_step_gap=1,
            grad_norm_clip_value=0.5, grad_clip_value=0.1)
        trainer.train(max_epochs=1)
        recs = [r for r in trainer.logger.read_all() if "train/grad_norm" in r]
        assert all(np.isfinite(r["train/grad_norm"]) for r in recs)


class TestMultiStep:
    def test_multi_step_equals_single_steps(self, small_setup):
        """K scanned steps in one program must match K successive
        single-step calls: the rng stream (fold-by-step) is identical by
        construction, so losses match to float noise.  Params are compared
        with tolerance, NOT bit-exactly: the two programs compile conv
        gradients with different reduction orders, and Adam's g/sqrt(v)
        normalisation amplifies near-zero grads up to lr scale (measured:
        ~1e-4 on a handful of conv-kernel elements per step, both paths
        individually deterministic)."""
        from gesture_diffusion_tpu.training import make_train_multi_step

        model, sched = small_setup
        ds = synthetic_dataset(n=24)
        opt = optax.adamw(1e-3)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 10, 12)),
            jnp.zeros((1,), jnp.int32), jnp.asarray(ds.data["wav"][:1]),
            train=False)

        def fresh():
            p = jax.tree.map(jnp.copy, variables["params"])
            return TrainState(p, jax.tree.map(jnp.copy, variables["batch_stats"]),
                              init_opt_state(opt, p), jnp.asarray(0, jnp.int32))

        key = jax.random.key(5)
        batches = [{k: jnp.asarray(v[i * 8:(i + 1) * 8])
                    for k, v in ds.data.items()} for i in range(3)]

        single = make_train_step(model, sched, opt, None)
        s = fresh()
        for b in batches:
            s, m_single = single(s, b, key)

        multi = make_train_multi_step(model, sched, opt, None)
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
        s2, m_multi = multi(fresh(), stacked, key)

        assert m_multi["loss"].shape == (3,)
        np.testing.assert_allclose(
            np.asarray(m_multi["loss"][-1]), np.asarray(m_single["loss"]),
            rtol=1e-2)
        for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)
        assert int(s2.step) == 3

    def test_trainer_steps_per_call(self, small_setup, tmp_path):
        """Trainer(steps_per_call=2) trains and logs per-step records,
        including the odd tail batch through the single-step path."""
        model, sched = small_setup
        trainer = _make_trainer(model, sched, tmp_path / "spc",
                                log_step_gap=1, batch_size=8,
                                steps_per_call=3)
        trainer.train(max_epochs=2)          # 4 batches/epoch at batch 8:
        # one 3-step scan + a 1-batch tail through the single-step path
        recs = [r for r in trainer.logger.read_all() if "train/loss" in r]
        assert len(recs) == 8
        assert [r["train/step"] for r in recs] == list(range(8))
        assert all(np.isfinite(r["train/loss"]) for r in recs)

    def test_steps_per_call_indivisible_batch_rejected(self, small_setup,
                                                       tmp_path):
        """The multi-step path shards the K-stack itself (iter_batches with
        mesh=None), so Trainer.__init__ must surface a batch_size that does
        not divide the mesh data axis up front instead of an opaque
        device_put sharding error inside _flush_multi."""
        model, sched = small_setup
        with pytest.raises(ValueError, match="not divisible"):
            _make_trainer(model, sched, tmp_path / "bad", batch_size=6,
                          steps_per_call=2)


class TestBatchStatsSharding:
    def test_params_replicated_batch_sharded(self, small_setup, tmp_path):
        model, sched = small_setup
        mesh = make_mesh()
        assert mesh.shape["data"] == 8  # virtual CPU mesh from conftest
        trainer = _make_trainer(model, sched, tmp_path / "sh")
        trainer.train(max_epochs=1)
        leaf = jax.tree.leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestLrSchedules:
    def test_noamxf_matches_reference_values(self):
        """Golden values from torch NoamLR(d_model=256, warmup=4000, base=1):
        lr(step k, 0-based) = 256^-0.5 * min((k+1)^-0.5, (k+1)*4000^-1.5)."""
        sch = noam_xf_schedule(1.0, 256, 4000)
        for k in [0, 10, 3999, 4000, 100000]:
            cur = k + 1
            want = 256 ** -0.5 * min(cur ** -0.5, cur * 4000 ** -1.5)
            assert float(sch(k)) == pytest.approx(want, rel=1e-5)

    def test_build_from_config(self):
        cfg = JsonConfig({"type": "noamxf", "warmup_steps": "4k", "d_model": 256})
        sch = build_lr_schedule(cfg, 1.0)
        assert float(sch(0)) == pytest.approx(256 ** -0.5 * 4000 ** -1.5, rel=1e-5)
        const = build_lr_schedule(None, 0.01)
        assert const(123) == 0.01


def test_encoder_bf16_matches_fp32_loss(small_setup, tmp_path):
    """Mixed precision (Train.encoder_dtype confines bf16 to the SE-ResNet
    trunk; the default in configs/beat-ours.json) must track the fp32
    training loss closely — measured 0.005% apart after 11 steps on TPU
    (PERF.md)."""
    _, sched = small_setup
    ds = synthetic_dataset()
    losses = {}
    for tag, enc_dt in (("fp32", None), ("encbf16", "bfloat16")):
        cfg = DenoiserConfig(d_pose=12, d_model=32, heads=4, n_layers=1,
                             dropout=0.0, encoder_dtype=enc_dt)
        model = GestureDenoiser(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 10, 12)),
            jnp.zeros((1,), jnp.int32), jnp.asarray(ds.data["wav"][:1]),
            train=False)
        opt = optax.adamw(1e-3)
        state = TrainState(variables["params"], variables["batch_stats"],
                           init_opt_state(opt, variables["params"]),
                           jnp.asarray(0, jnp.int32))
        step = make_train_step(model, sched, opt, None)
        batch = {"pose": jnp.asarray(ds.data["pose"][:8]),
                 "wav": jnp.asarray(ds.data["wav"][:8])}
        for _ in range(3):
            state, metrics = step(state, batch, jax.random.key(7))
        losses[tag] = float(metrics["loss"])
    assert losses["encbf16"] == pytest.approx(losses["fp32"], rel=0.02), losses


def test_wasserstein_1d_properties():
    import jax.numpy as jnp

    a = jnp.asarray(np.random.default_rng(0).normal(0, 1, 100).astype(np.float32))
    assert float(wasserstein_distance_1d(a, a)) < 1e-5
    b = a + 2.0
    assert float(wasserstein_distance_1d(a, b)) == pytest.approx(2.0, abs=1e-3)


def test_noam_decay_schedule_shape_and_floor():
    """noam (plain) schedule: peaks at exactly base_lr at step==warmup,
    rises before it, decays ~step^-0.5 after, and the optional minimum
    floors the post-warmup tail only (ref trainer.py noam branch)."""
    from gesture_diffusion_tpu.training.lr_schedule import noam_decay_schedule

    sch = noam_decay_schedule(1e-3, warmup_steps=100)
    assert float(sch(100)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sch(50)) == pytest.approx(0.5e-3, rel=1e-6)      # linear ramp
    assert float(sch(400)) == pytest.approx(0.5e-3, rel=1e-6)     # 1/sqrt(4)
    vals = [float(sch(s)) for s in (1, 25, 50, 99, 100, 200, 400, 10000)]
    assert all(a < b for a, b in zip(vals[:4], vals[1:5]))
    assert all(a > b for a, b in zip(vals[4:], vals[5:]))

    floored = noam_decay_schedule(1e-3, warmup_steps=100, minimum=4e-4)
    assert float(floored(10000)) == pytest.approx(4e-4)
    assert float(floored(50)) == pytest.approx(0.5e-3, rel=1e-6)  # ramp unfloored


def test_corrupt_checkpoint_named_error(tmp_path):
    """Auto-resume retries latest_checkpoint on every startup, so a corrupt
    file must fail NAMING the path with a recovery hint, not with flax's
    bare msgpack error (fuzz finding); structure mismatches keep flax's own
    descriptive error."""
    import numpy as np
    from gesture_diffusion_tpu.training.checkpoint import (
        load_checkpoint, save_checkpoint)

    target = {"params": {"w": np.ones((2, 2), np.float32)}}
    p = str(tmp_path / "chkpt.msgpack")

    with open(p, "wb") as f:
        f.write(b"\x00garbage\xff" * 20)
    with pytest.raises(ValueError, match="chkpt.msgpack.*move it aside"):
        load_checkpoint(p, target)

    save_checkpoint(p, target, {"step": 3})
    raw = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(ValueError, match="chkpt.msgpack.*move it aside"):
        load_checkpoint(p, target)

    save_checkpoint(p, target, {"step": 3})
    with open(p + ".meta.json", "w") as f:
        f.write("{bad")
    with pytest.raises(ValueError, match="meta.json.*move it aside"):
        load_checkpoint(p, target)

    # healthy restore still round-trips
    with open(p + ".meta.json", "w") as f:
        f.write('{"step": 3}')
    tree, meta = load_checkpoint(p, target)
    assert meta == {"step": 3}
    np.testing.assert_array_equal(tree["params"]["w"], target["params"]["w"])
    # a structure mismatch on an INTACT file must never advise deletion —
    # the bytes msgpack-decode fine, so the config/code changed, not the
    # file.  Covers both flax message shapes (dict-key and list-size
    # mismatches), which the old substring check ('target dict') missed.
    for bad_target in ({"different": np.zeros(3)},
                       {"params": [np.zeros(3), np.zeros(3)]}):
        with pytest.raises(ValueError, match="does not match the current"):
            load_checkpoint(p, bad_target)
        with pytest.raises(ValueError) as ei:
            load_checkpoint(p, bad_target)
        assert "move it aside" not in str(ei.value)
