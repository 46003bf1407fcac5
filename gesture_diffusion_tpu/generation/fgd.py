"""Fréchet Gesture Distance (FGD) evaluation in embedding space.

Capability parity with the reference's optional
``EmbeddingSpaceEvaluator`` + ``MotionAE``
(``models/modules/ha2g/model/embedding_space_evaluator.py:16-209``,
``motion_ae.py:33-123``): a convolutional motion autoencoder maps pose
windows to latent features; generated-vs-real feature distributions are
compared with the Fréchet distance (Dougal Sutherland's stable form), plus
latent L1 distance and a diversity score.

The reference required an unshipped pretrained torch checkpoint; here the
autoencoder is a flax model with a `train_motion_ae` helper so the
embedding net can be fit on any windowed dataset, and checkpoints
save/restore via flax msgpack.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg


def _sqrtm(a: np.ndarray) -> np.ndarray:
    """scipy.linalg.sqrtm across API generations: pre-1.16 needs
    disp=False to suppress stdout noise on the ill-conditioned products
    this module retries with an eps offset (and then returns an
    (X, errest) tuple); 1.16+ deprecated the parameter (passing it warns)."""
    import scipy

    if tuple(int(x) for x in scipy.__version__.split(".")[:2]) < (1, 16):
        out = linalg.sqrtm(a, disp=False)
        return out[0] if isinstance(out, tuple) else out
    return linalg.sqrtm(a)


class PoseEncoderConv(nn.Module):
    latent_dim: int = 32

    @nn.compact
    def __call__(self, poses: jax.Array) -> jax.Array:
        """(N, T, C) -> (N, latent_dim)."""
        h = poses
        for ch, stride in [(32, 1), (64, 1), (64, 2)]:
            h = nn.Conv(ch, (3,), strides=(stride,), padding="VALID")(h)
            h = nn.LayerNorm()(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(32, (3,), padding="VALID")(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(256)(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(128)(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.latent_dim)(h)


class PoseDecoderConv(nn.Module):
    length: int
    pose_dim: int

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        """(N, latent_dim) -> (N, T, C)."""
        h = nn.Dense(128)(feat)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(self.length * 4)(h)
        h = h.reshape(h.shape[0], self.length, 4)
        for ch in (32, 32):
            h = nn.Conv(ch, (3,), padding="SAME")(h)
            h = nn.LayerNorm()(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(self.pose_dim, (3,), padding="SAME")(h)


class MotionAE(nn.Module):
    length: int
    pose_dim: int
    latent_dim: int = 32

    def setup(self):
        self.encoder = PoseEncoderConv(self.latent_dim)
        self.decoder = PoseDecoderConv(self.length, self.pose_dim)

    def __call__(self, poses: jax.Array) -> Tuple[jax.Array, jax.Array]:
        feat = self.encoder(poses)
        return self.decoder(feat), feat

    def encode(self, poses: jax.Array) -> jax.Array:
        return self.encoder(poses)


def train_motion_ae(
    poses: np.ndarray,           # (N, T, C)
    latent_dim: int = 32,
    steps: int = 2000,
    batch_size: int = 64,
    lr: float = 5e-4,
    seed: int = 0,
) -> Tuple[MotionAE, dict]:
    """Fit the embedding net with an L1 reconstruction objective."""
    import optax

    n, t, c = poses.shape
    model = MotionAE(length=t, pose_dim=c, latent_dim=latent_dim)
    rng = np.random.default_rng(seed)
    params = model.init(jax.random.key(seed), jnp.asarray(poses[:2]))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch):
        def loss_fn(p):
            recon, _ = model.apply({"params": p}, batch)
            return jnp.abs(recon - batch).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = min(batch_size, n)
    for _ in range(steps):
        idx = rng.choice(n, bs, replace=False)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(poses[idx]))
    return model, {"params": params}


def save_motion_ae(path: str, model: MotionAE, variables: dict) -> None:
    import os

    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "meta": {"length": model.length, "pose_dim": model.pose_dim,
                 "latent_dim": model.latent_dim},
        "variables": variables,
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_motion_ae(path: str) -> Tuple[MotionAE, dict]:
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    meta = raw["meta"]
    model = MotionAE(length=int(meta["length"]), pose_dim=int(meta["pose_dim"]),
                     latent_dim=int(meta["latent_dim"]))
    return model, raw["variables"]


def load_or_train_motion_ae(
    path: "str | None",
    train_poses: np.ndarray,
    latent_dim: int = 32,
    steps: int = 2000,
) -> Tuple[MotionAE, dict]:
    """The reference required an unshipped pretrained torch checkpoint
    (``embedding_space_evaluator.py:20``); here the embedding net is
    trained on the fly and cached at ``path``."""
    import os

    if path and os.path.exists(path):
        return load_motion_ae(path)
    model, variables = train_motion_ae(train_poses, latent_dim=latent_dim,
                                       steps=steps)
    if path:
        save_motion_ae(path, model, variables)
    return model, variables


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)), stable form."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


class EmbeddingSpaceEvaluator:
    """Accumulate (generated, real) pose windows; score FGD + latent L1 +
    diversity (reference ``embedding_space_evaluator.py`` API)."""

    def __init__(self, model: MotionAE, variables: dict):
        self.model = model
        self.variables = variables
        self._encode = jax.jit(
            lambda v, x: model.apply(v, x, method=MotionAE.encode))
        self.reset()

    def reset(self) -> None:
        self.real_feat_list: List[np.ndarray] = []
        self.generated_feat_list: List[np.ndarray] = []

    def get_no_of_samples(self) -> int:
        return sum(len(f) for f in self.real_feat_list)

    def push_samples(self, generated_poses, real_poses) -> None:
        self.generated_feat_list.append(
            np.asarray(self._encode(self.variables, jnp.asarray(generated_poses))))
        self.real_feat_list.append(
            np.asarray(self._encode(self.variables, jnp.asarray(real_poses))))

    def get_scores(self) -> Tuple[float, float]:
        """:return: (frechet_distance, mean latent L1 distance)."""
        gen = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        try:
            fd = calculate_frechet_distance(
                gen.mean(0), np.cov(gen, rowvar=False),
                real.mean(0), np.cov(real, rowvar=False))
        except ValueError:
            fd = 1e10
        feat_dist = float(np.mean(np.sum(np.abs(real - gen), axis=-1)))
        return fd, feat_dist

    def get_diversity_scores(self, max_samples: int = 500,
                             seed: int = 0) -> float:
        feats = np.vstack(self.generated_feat_list)[:max_samples]
        rng = np.random.default_rng(seed)
        shuffled = feats[rng.permutation(len(feats))]
        return float(np.mean(np.sum(np.abs(feats - shuffled), axis=-1)))
