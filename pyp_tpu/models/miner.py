"""Self-supervised tomogram pattern mining (the MiLoPYP role).

TPU-native equivalent of the reference's MiLoPYP integration
(detect/joint.py:640 `milotrain`, :1011 `miloeval` — an external torch/pixi
pipeline): embed densely-sampled tomogram subvolumes with a small 3D conv
encoder trained contrastively (SimCLR/NT-Xent on augmented views of the
same patch), cluster the embeddings with k-means, and return per-cluster
exemplar coordinates so a user can select the clusters that look like their
molecule and hand those coordinates to extraction — exploration-first
picking without any labels.

Design notes (TPU-first): the encoder is a few strided 3D convs ending in a
global pool + projection head — all static shapes, jit-compiled once for
the (patch, batch) geometry; augmentations are axis flips / 90-degree
rotations / Gaussian noise, realized as pure array ops inside the batch
build; k-means runs as a handful of jitted distance matmuls.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyp_tpu.utils import get_logger

logger = get_logger("miner")


class Encoder3D(nn.Module):
    """Strided 3D conv encoder -> L2-normalized embedding."""

    features: Sequence[int] = (16, 32, 64)
    embed_dim: int = 32

    @nn.compact
    def __call__(self, x):
        # x: (B, D, H, W, 1)
        for f in self.features:
            x = nn.Conv(f, (3, 3, 3), strides=(2, 2, 2), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=min(8, f))(x)
            x = nn.silu(x)
        x = x.mean(axis=(1, 2, 3))              # global average pool
        x = nn.Dense(self.embed_dim * 2)(x)
        x = nn.silu(x)
        x = nn.Dense(self.embed_dim)(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


class MinerModel(NamedTuple):
    params: dict
    patch: int
    embed_dim: int


def _augment(patches, rng):
    """Random flips / in-plane 90-degree rotations / noise (numpy-side)."""
    out = patches.copy()
    B = len(out)
    for ax in (1, 2, 3):
        flip = rng.rand(B) < 0.5
        out[flip] = np.flip(out[flip], axis=ax)
    k = rng.randint(0, 4, B)
    for i in range(B):
        if k[i]:
            out[i] = np.rot90(out[i], k[i], axes=(1, 2))
    out = out + rng.randn(*out.shape).astype(np.float32) * 0.3 * out.std()
    return out


def _normalize(p):
    m = p.mean(axis=(1, 2, 3), keepdims=True)
    s = p.std(axis=(1, 2, 3), keepdims=True)
    return (p - m) / (s + 1e-6)


def sample_grid_patches(tomogram, patch: int, stride: int):
    """Dense grid of subvolumes + their center coordinates (z, y, x)."""
    nz, ny, nx = tomogram.shape
    coords, wins = [], []
    for z0 in range(0, nz - patch + 1, stride):
        for y0 in range(0, ny - patch + 1, stride):
            for x0 in range(0, nx - patch + 1, stride):
                wins.append(tomogram[z0:z0 + patch, y0:y0 + patch,
                                     x0:x0 + patch])
                coords.append((z0 + patch // 2, y0 + patch // 2,
                               x0 + patch // 2))
    return (np.asarray(wins, dtype=np.float32),
            np.asarray(coords, dtype=np.int32))


def train_miner(tomograms, patch: int = 16, n_steps: int = 200,
                batch: int = 64, embed_dim: int = 32, lr: float = 1e-3,
                temperature: float = 0.2, seed: int = 0) -> MinerModel:
    """Contrastive training on random patches from the given tomograms.

    NT-Xent over a batch of (view1, view2) pairs: the two augmented views
    of patch i are positives, everything else negatives."""
    rng = np.random.RandomState(seed)
    enc = Encoder3D(embed_dim=embed_dim)
    params = enc.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, patch, patch, patch, 1)))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x1, x2):
        def loss_fn(p):
            z1 = enc.apply(p, x1)
            z2 = enc.apply(p, x2)
            z = jnp.concatenate([z1, z2])                 # (2B, E)
            sim = z @ z.T / temperature
            B2 = z.shape[0]
            sim = sim - 1e9 * jnp.eye(B2)                 # mask self
            pos = jnp.concatenate([jnp.arange(x1.shape[0]) + x1.shape[0],
                                   jnp.arange(x1.shape[0])])
            return jnp.mean(
                -sim[jnp.arange(B2), pos]
                + jax.scipy.special.logsumexp(sim, axis=1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    def random_patches(n):
        out = []
        for _ in range(n):
            t = tomograms[rng.randint(len(tomograms))]
            nz, ny, nx = t.shape
            z0 = rng.randint(0, nz - patch + 1)
            y0 = rng.randint(0, ny - patch + 1)
            x0 = rng.randint(0, nx - patch + 1)
            out.append(t[z0:z0 + patch, y0:y0 + patch, x0:x0 + patch])
        return np.asarray(out, dtype=np.float32)

    for it in range(n_steps):
        base = random_patches(batch)
        x1 = _normalize(_augment(base, rng))[..., None]
        x2 = _normalize(_augment(base, rng))[..., None]
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x1), jnp.asarray(x2))
        if it % 50 == 0:
            logger.info("miner step %d: loss %.4f", it, float(loss))
    return MinerModel(params=params, patch=patch, embed_dim=embed_dim)


def embed_patches(model: MinerModel, patches, batch: int = 256):
    """(N, p, p, p) -> (N, E) L2-normalized embeddings."""
    enc = Encoder3D(embed_dim=model.embed_dim)
    out = []
    x = _normalize(np.asarray(patches, dtype=np.float32))[..., None]
    apply = jax.jit(lambda p, v: enc.apply(p, v))
    for lo in range(0, len(x), batch):
        chunk = x[lo:lo + batch]
        pad = batch - len(chunk)  # keep one compiled shape
        if pad:
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
        z = np.asarray(apply(model.params, jnp.asarray(chunk)))
        out.append(z[:batch - pad] if pad else z)
    return np.concatenate(out)


def kmeans(embeddings, k: int, n_iters: int = 30, seed: int = 0):
    """Cosine k-means on L2-normalized embeddings -> (labels, centroids)."""
    z = np.asarray(embeddings, dtype=np.float32)
    rng = np.random.RandomState(seed)
    centroids = z[rng.choice(len(z), size=k, replace=False)]
    for _ in range(n_iters):
        sim = z @ centroids.T                      # cosine similarity
        labels = np.argmax(sim, axis=1)
        for j in range(k):
            members = z[labels == j]
            if len(members):
                c = members.mean(axis=0)
                centroids[j] = c / (np.linalg.norm(c) + 1e-8)
    return labels, centroids


def mine_tomogram(model: MinerModel, tomogram, n_clusters: int = 8,
                  stride: int = None, exemplars_per_cluster: int = 5):
    """Dense sweep -> embeddings -> clusters; returns a dict per cluster:
    {"coords" (N, 3), "exemplars" (M, 3), "size"} — the miloeval contract
    (cluster gallery the user selects pickable classes from)."""
    stride = stride or model.patch // 2
    wins, coords = sample_grid_patches(
        np.asarray(tomogram, dtype=np.float32), model.patch, stride)
    z = embed_patches(model, wins)
    labels, centroids = kmeans(z, n_clusters)
    clusters = []
    for j in range(n_clusters):
        idx = np.where(labels == j)[0]
        if not len(idx):
            clusters.append({"coords": np.zeros((0, 3), np.int32),
                             "exemplars": np.zeros((0, 3), np.int32),
                             "size": 0})
            continue
        # exemplars: members closest to the centroid
        order = np.argsort(-(z[idx] @ centroids[j]))
        ex = coords[idx[order[:exemplars_per_cluster]]]
        clusters.append({"coords": coords[idx], "exemplars": ex,
                         "size": int(len(idx))})
    return clusters, labels, coords
