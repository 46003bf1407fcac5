"""Loss-aware timestep schedule sampling (reference
``models/modules/resample.py:60-108``): host-side importance draws, the
cross-host history sync (``update_with_local_losses`` — the one explicit
collective SURVEY §5 calls out), and the Trainer wiring behind
``Train.schedule_sampler: "loss-second-moment"``."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gesture_diffusion_tpu.diffusion import make_schedule
from gesture_diffusion_tpu.diffusion.schedules import cosine_betas
from gesture_diffusion_tpu.diffusion.resample import (
    LossSecondMomentResampler,
    UniformSampler,
)
from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
from gesture_diffusion_tpu.parallel import make_mesh
from gesture_diffusion_tpu.training import (
    ArrayDataset,
    Trainer,
    TrainState,
    init_opt_state,
    make_train_step,
)


def _dataset(n=32, t_pose=10, d_pose=12, t_wav=8000, seed=0):
    rng = np.random.default_rng(seed)
    wav = rng.normal(0, 0.5, (n, t_wav)).astype(np.float32)
    base = wav[:, :: t_wav // (t_pose * d_pose)][:, : t_pose * d_pose]
    pose = 0.8 * base.reshape(n, t_pose, d_pose) + 0.1 * rng.normal(
        size=(n, t_pose, d_pose))
    return ArrayDataset({"wav": wav, "pose": pose.astype(np.float32)})


class TestLocalLossSync:
    def test_per_host_histories_converge_to_global(self):
        """Two 'hosts' feeding disjoint local (t, loss) pairs through
        update_with_local_losses (with an injected allgather standing in
        for jax.experimental.multihost_utils on the single-process CPU
        mesh) must end with bit-identical histories — equal to a single
        global update_with_all_losses, mirroring ref resample.py:91-108."""
        rng = np.random.default_rng(0)
        hosts = [LossSecondMomentResampler(8, history_per_term=3)
                 for _ in range(2)]
        global_sampler = LossSecondMomentResampler(8, history_per_term=3)
        for _ in range(12):
            ts = [rng.integers(0, 8, size=4).astype(np.int32)
                  for _ in range(2)]
            losses = [rng.random(4).astype(np.float32) for _ in range(2)]

            def gather(x, ts=ts, losses=losses):
                # every host's stacked (n, 2) (t, loss) rows in process
                # order, as process_allgather would return them (the
                # sampler gathers ONE pairs array, not two columns)
                assert x.ndim == 2 and x.shape[1] == 2
                return [np.stack([t.astype(np.float64),
                                  ls.astype(np.float64)], axis=1)
                        for t, ls in zip(ts, losses)]

            for h, sampler in enumerate(hosts):
                sampler.update_with_local_losses(ts[h], losses[h],
                                                 allgather=gather)
            global_sampler.update_with_all_losses(
                np.concatenate(ts), np.concatenate(losses))
        np.testing.assert_array_equal(hosts[0]._loss_history,
                                      hosts[1]._loss_history)
        np.testing.assert_array_equal(hosts[0]._loss_counts,
                                      hosts[1]._loss_counts)
        np.testing.assert_array_equal(hosts[0]._loss_history,
                                      global_sampler._loss_history)
        np.testing.assert_array_equal(hosts[0].weights(),
                                      global_sampler.weights())
        assert global_sampler._warmed_up()

    def test_single_process_default_allgather_is_identity(self):
        s = LossSecondMomentResampler(4, history_per_term=2)
        s.update_with_local_losses(np.array([0, 1, 2, 3]),
                                   np.array([1.0, 2.0, 3.0, 4.0]))
        assert s._loss_counts.sum() == 4

    def test_default_allgather_pads_ragged_contributions(self, monkeypatch):
        """The reference pads ragged per-rank batches before its all_gather
        (resample.py:95-103); process_allgather stacks equal shapes only,
        so _default_allgather must pad to the global max and strip after
        the gather.  Simulated 2-process run: this host holds 3 pairs, the
        peer 5 — the gathered lists keep the true lengths and values."""
        import jax

        from gesture_diffusion_tpu.diffusion import resample as rs

        peer = np.array([10.0, 11.0, 12.0, 13.0, 14.0])

        class FakeMHU:
            @staticmethod
            def process_allgather(x, tiled=False):
                x = np.asarray(x)
                if x.ndim == 0:               # the length gather
                    return np.stack([x, np.asarray(len(peer), x.dtype)])
                padded_peer = np.concatenate(
                    [peer.astype(x.dtype),
                     np.zeros(len(x) - len(peer), x.dtype)])
                return np.stack([x, padded_peer[: len(x)]])

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        import jax.experimental

        monkeypatch.setattr(jax.experimental, "multihost_utils", FakeMHU)
        out = rs._default_allgather(np.array([1.0, 2.0, 3.0]))
        assert len(out) == 2
        np.testing.assert_array_equal(out[0], [1.0, 2.0, 3.0])
        np.testing.assert_array_equal(out[1], peer)


class TestHostSideDraws:
    def test_uniform_sample_np(self):
        t, w = UniformSampler(100).sample_np(np.random.default_rng(0), 64)
        assert t.shape == (64,) and t.dtype == np.int32
        assert (0 <= t).all() and (t < 100).all()
        np.testing.assert_array_equal(w, np.ones(64, np.float32))

    def test_loss_aware_sample_np_importance_identity(self):
        """Warmed sampler: draws skew toward high-RMS-loss timesteps and
        the returned weights satisfy w(t) = 1/(T p(t)) exactly — so the
        weighted loss stays an unbiased estimate of the uniform loss."""
        s = LossSecondMomentResampler(4, history_per_term=2,
                                      uniform_prob=0.001)
        s.update_with_all_losses(np.array([0, 0, 1, 1, 2, 2, 3, 3]),
                                 np.array([9.0, 9.0, 1.0, 1.0,
                                           1.0, 1.0, 1.0, 1.0]))
        assert s._warmed_up()
        rng = np.random.default_rng(1)
        t, w = s.sample_np(rng, 4000)
        counts = np.bincount(t, minlength=4)
        assert counts[0] > 2 * counts[1]
        p = s.weights() / s.weights().sum()
        np.testing.assert_allclose(w, (1.0 / (4 * p))[t], rtol=1e-6)


class TestTrainerWiring:
    @pytest.fixture(scope="class")
    def small(self):
        cfg = DenoiserConfig(d_pose=12, d_model=32, heads=4, n_layers=1,
                             dropout=0.0)
        # 4 timesteps (cosine stays beta<=1 at any T, linear does not):
        # warm-up = 4 t-bins x 10-term history = 40 draws, reached within
        # the training test's 4 epochs x 32 examples
        return GestureDenoiser(cfg), make_schedule(cosine_betas(4))

    def test_loss_aware_trainer_trains_and_warms_up(self, small, tmp_path):
        model, sched = small
        trainer = Trainer(
            model, sched, optax.adamw(3e-4), lambda s: 3e-4,
            _dataset(seed=0), _dataset(n=16, seed=1), batch_size=16,
            log_dir=str(tmp_path), seed=0, mesh=make_mesh(),
            log_step_gap=1, schedule_sampler="loss-second-moment")
        assert isinstance(trainer.sampler, LossSecondMomentResampler)
        trainer.train(max_epochs=4)
        # 4 epochs x 32 examples fed back into a 4-timestep history
        # (cap 10/term): the sampler must be warmed and drawing weighted
        assert trainer.sampler._loss_counts.sum() > 0
        assert trainer.sampler._warmed_up()
        assert np.isfinite(trainer.best_metric_value)

    def test_uniform_name_keeps_in_graph_path(self, small, tmp_path):
        model, sched = small
        trainer = Trainer(
            model, sched, optax.adamw(3e-4), lambda s: 3e-4,
            _dataset(seed=0), _dataset(n=16, seed=1), batch_size=16,
            log_dir=str(tmp_path / "u"), seed=0, mesh=make_mesh(),
            schedule_sampler="uniform")
        assert trainer.sampler is None

    def test_steps_per_call_conflict_rejected(self, small, tmp_path):
        model, sched = small
        with pytest.raises(ValueError, match="steps_per_call"):
            Trainer(
                model, sched, optax.adamw(3e-4), lambda s: 3e-4,
                _dataset(seed=0), _dataset(n=16, seed=1), batch_size=16,
                log_dir=str(tmp_path / "c"), seed=0, mesh=make_mesh(),
                steps_per_call=2, schedule_sampler="loss-second-moment")

    def test_external_timesteps_weight_scaling(self, small):
        """The denoise term is the WEIGHTED per-example mean: doubling the
        weights doubles it (and the per-example vector stays unweighted)."""
        model, sched = small
        ds = _dataset(n=8)
        batch = {k: jnp.asarray(v[:8]) for k, v in ds.data.items()}
        variables = model.init(
            jax.random.key(0), batch["pose"], jnp.zeros((8,), jnp.int32),
            batch["wav"], train=False)
        optimizer = optax.adamw(1e-4)

        def fresh_state():
            params = jax.tree.map(jnp.copy, variables["params"])
            return TrainState(params,
                              jax.tree.map(jnp.copy,
                                           variables.get("batch_stats", {})),
                              init_opt_state(optimizer, params),
                              jnp.asarray(0, jnp.int32))

        step = make_train_step(model, sched, optimizer, None,
                               external_timesteps=True)
        t = jnp.asarray(np.arange(8) % 4, jnp.int32)
        ones = jnp.ones((8,), jnp.float32)
        _, m1 = step(fresh_state(), batch, jax.random.key(1), t, ones)
        _, m2 = step(fresh_state(), batch, jax.random.key(1), t, 2.0 * ones)
        d1 = float(m1["denoise"])
        d2 = float(m2["denoise"])
        assert d2 == pytest.approx(2.0 * d1, rel=1e-5)
        per_ex = np.asarray(m1["mse_per_example"])
        assert per_ex.shape == (8,)
        assert float(per_ex.mean()) == pytest.approx(d1, rel=1e-5)
        np.testing.assert_allclose(np.asarray(m2["mse_per_example"]),
                                   per_ex, rtol=1e-6)


def test_dedup_local_pairs_on_replicated_model_axis():
    """Review fix: under a DPxTP mesh the (N,) per-example loss vector is
    sharded on 'data' and REPLICATED on 'model', so addressable_shards
    yields every data-row range model_size times; dedup_local_pairs must
    return each example exactly once (duplicates would fill the sampler
    history at 2x rate and evict real entries early)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from gesture_diffusion_tpu.training.trainer import dedup_local_pairs

    mesh = make_mesh(n_data=4, n_model=2)
    losses = jnp.arange(16, dtype=jnp.float32) * 0.5
    sharded = jax.device_put(losses,
                             NamedSharding(mesh, PartitionSpec("data")))
    assert len(sharded.addressable_shards) == 8   # 4 data x 2 model
    t_np = (np.arange(16) % 4).astype(np.int32)
    ts, ls = dedup_local_pairs(sharded, t_np)
    # single-process: "local" = everything, each example exactly once
    order = np.argsort(ls)
    np.testing.assert_array_equal(np.sort(ls), np.arange(16) * 0.5)
    np.testing.assert_array_equal(ts[order], t_np)

    # fully-replicated corner (XLA may replicate small outputs entirely)
    rep = jax.device_put(losses, NamedSharding(mesh, PartitionSpec()))
    ts, ls = dedup_local_pairs(rep, t_np)
    np.testing.assert_array_equal(ls, np.asarray(losses))
    np.testing.assert_array_equal(ts, t_np)
