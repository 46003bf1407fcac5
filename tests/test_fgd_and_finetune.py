"""FGD embedding-space evaluator, official-split prep, fine-tune init."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_diffusion_tpu.generation.fgd import (
    EmbeddingSpaceEvaluator,
    MotionAE,
    calculate_frechet_distance,
    train_motion_ae,
)


def _motion_windows(n, t=20, c=12, seed=0, shift=0.0):
    rng = np.random.default_rng(seed)
    time = np.linspace(0, 2, t)[None, :, None]
    freqs = rng.uniform(0.5, 2.0, (n, 1, c))
    return (np.sin(2 * np.pi * freqs * time) + shift
            + 0.05 * rng.normal(size=(n, t, c))).astype(np.float32)


class TestFrechet:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 8))
        d = calculate_frechet_distance(x.mean(0), np.cov(x, rowvar=False),
                                       x.mean(0), np.cov(x, rowvar=False))
        assert abs(d) < 1e-6

    def test_shifted_gaussians(self):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1, (2000, 4))
        b = rng.normal(2, 1, (2000, 4))
        d = calculate_frechet_distance(a.mean(0), np.cov(a, rowvar=False),
                                       b.mean(0), np.cov(b, rowvar=False))
        assert d == pytest.approx(16.0, rel=0.2)  # |mu|^2 = 4 * 2^2

    def test_golden_vs_closed_form_diagonal(self):
        """Golden oracle: for diagonal covariances the Fréchet distance has
        the closed form |mu1-mu2|^2 + sum(s1 + s2 - 2*sqrt(s1*s2))."""
        rng = np.random.default_rng(7)
        mu1, mu2 = rng.normal(size=(2, 6))
        s1, s2 = rng.uniform(0.5, 3.0, (2, 6))
        expected = float(((mu1 - mu2) ** 2).sum()
                         + (s1 + s2 - 2.0 * np.sqrt(s1 * s2)).sum())
        got = calculate_frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
        assert got == pytest.approx(expected, rel=1e-8)

    def test_golden_vs_eigen_oracle_full_cov(self):
        """Independent oracle via eigendecomposition: Tr sqrt(C1 C2)
        computed as the sum of sqrt-eigenvalues of C1 @ C2."""
        rng = np.random.default_rng(8)
        a = rng.normal(size=(300, 5))
        b = rng.normal(0.3, 1.2, (300, 5))
        mu1, c1 = a.mean(0), np.cov(a, rowvar=False)
        mu2, c2 = b.mean(0), np.cov(b, rowvar=False)
        eig = np.linalg.eigvals(c1 @ c2)
        tr_sqrt = np.sqrt(np.abs(eig)).sum()
        expected = float(((mu1 - mu2) ** 2).sum()
                         + np.trace(c1) + np.trace(c2) - 2.0 * tr_sqrt)
        got = calculate_frechet_distance(mu1, c1, mu2, c2)
        assert got == pytest.approx(expected, rel=1e-6)

    def test_pinned_net_scores_are_reproducible(self, tmp_path):
        """Two consecutive evaluations through the save/load path must score
        the SAME FGD (the reference pinned a pretrained net; we pin a seeded
        one cached on disk)."""
        from gesture_diffusion_tpu.generation.fgd import (
            load_or_train_motion_ae,
        )

        poses = _motion_windows(48)
        path = str(tmp_path / "ae.msgpack")

        def run_eval():
            model, variables = load_or_train_motion_ae(
                path, poses, steps=10)
            ev = EmbeddingSpaceEvaluator(model, variables)
            ev.push_samples(_motion_windows(32, seed=2, shift=0.3),
                            _motion_windows(32, seed=3))
            return ev.get_scores()

        first, second = run_eval(), run_eval()   # 2nd run loads the cache
        assert os.path.exists(path)
        assert first == second


class TestMotionAE:
    def test_reconstruction_learns(self):
        poses = _motion_windows(64)
        model, variables = train_motion_ae(poses, steps=200, latent_dim=16)
        recon, feat = model.apply(variables, jnp.asarray(poses[:8]))
        assert recon.shape == (8, 20, 12)
        assert feat.shape == (8, 16)
        err = float(jnp.abs(recon - jnp.asarray(poses[:8])).mean())
        assert err < 0.7  # well below the ~0.9 error of predicting zeros


class TestEvaluator:
    @pytest.fixture(scope="class")
    def evaluator(self):
        poses = _motion_windows(64)
        model, variables = train_motion_ae(poses, steps=150, latent_dim=16)
        return EmbeddingSpaceEvaluator(model, variables)

    def test_self_fgd_near_zero_and_mismatch_larger(self, evaluator):
        real = _motion_windows(48, seed=2)
        evaluator.reset()
        evaluator.push_samples(real, real)
        fd_same, feat_same = evaluator.get_scores()
        assert fd_same == pytest.approx(0.0, abs=1e-6)
        assert feat_same == pytest.approx(0.0, abs=1e-6)

        evaluator.reset()
        fake = _motion_windows(48, seed=3, shift=2.0)
        evaluator.push_samples(fake, real)
        fd_diff, feat_diff = evaluator.get_scores()
        assert fd_diff > 1e-3 and feat_diff > 1e-2
        assert evaluator.get_no_of_samples() == 48
        assert evaluator.get_diversity_scores() >= 0.0


class TestFineTune:
    def test_load_start_params_merges_matching(self, tmp_path):
        from flax import serialization

        from gesture_diffusion_tpu.training.trainer import load_start_params

        donor = {"a": {"kernel": np.ones((3, 3), np.float32)},
                 "b": {"kernel": np.full((2,), 7.0, np.float32)}}
        path = str(tmp_path / "start.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes({"best_params": donor}))

        fresh = {"a": {"kernel": np.zeros((3, 3), np.float32)},
                 "b": {"kernel": np.zeros((5,), np.float32)},   # shape mismatch
                 "c": {"kernel": np.zeros((2,), np.float32)}}   # new param
        merged = load_start_params(fresh, path)
        np.testing.assert_allclose(np.asarray(merged["a"]["kernel"]), 1.0)
        np.testing.assert_allclose(np.asarray(merged["b"]["kernel"]), 0.0)
        np.testing.assert_allclose(np.asarray(merged["c"]["kernel"]), 0.0)


class TestOfficialSplit:
    def test_routing_by_filename(self, tmp_path):
        from tests.test_prep import SAMPLE_TEXTGRID, _write_toy_bvh, _write_toy_wav

        from gesture_diffusion_tpu.data.beat import split_dataset_official

        src = tmp_path / "BEAT" / "1"
        os.makedirs(src)
        # recording indices: 1 (test_seq), 56 (val_seq), 30 (train)
        for i in (1, 56, 30):
            base = str(src / f"1_wayne_0_{i}_{i}")
            _write_toy_bvh(base + ".bvh", seed=i)
            _write_toy_wav(base + ".wav", seed=i)
            with open(base + ".TextGrid", "w") as f:
                f.write(SAMPLE_TEXTGRID)
        spt = str(tmp_path / "spt")
        split_dataset_official(str(tmp_path / "BEAT"), [1], 16000, 10.0, spt,
                               pose_fps=20, joints=["Spine"])
        import pickle

        sizes = {}
        for split in ("train", "val", "test"):
            with open(os.path.join(spt, f"{split}_samples.pkl"), "rb") as f:
                sizes[split] = len(pickle.load(f)["pose"])
        # each 30 s recording yields 2 chunks of 10 s (last partial dropped)
        assert sizes == {"train": 2, "val": 2, "test": 2}
