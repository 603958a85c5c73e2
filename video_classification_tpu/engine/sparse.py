"""Sparse ensemble fusion pipeline.

Reproduces `/root/reference/train_sparse.py`:

  * ``ResultSaver`` — for each part stream, rebuild uniform-sampling loaders with no
    shuffle, run the stream's best checkpoint over train and test splits, and pickle
    ``{'ps','t','acc','sv'}`` to ``<ROOT>/logs/sparse_fusion/{train,test}/<name>``
    (train_sparse.py:29-87).
  * ``SparseFusionDataset`` — stack the part pickles into PS (P, N, C) score
    tensors (train_sparse.py:107-147).
  * ``SparseTrainer`` — train the per-class Linear(P->1) fusion (a (C,P) einsum
    here) with Adam 1e-3, batch 500, 2000 epochs, testing every 10 epochs with the
    same per-video mean-score aggregation, checkpointing on best accuracy
    (train_sparse.py:150-244). The whole dataset is small (P x N x C scores), so
    the *entire* epoch runs as one jitted scan over shuffled batches on device.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.defaults import load_model_cfg
from ..models.sparse_fusion import SparseModel
from ..ops.segment import per_video_accuracy, segment_ids_from_counts
from ..utils.logging import MetricsLogger

PART_YAMLS = [  # train_sparse.py:36
    "slowfast-HTAH",
    "slowfast-LHandArm",
    "slowfast-LHand",
    "slowfast-RHandArm",
    "slowfast-RHand",
]

SPARSE_BATCH = 500     # train_sparse.py:153
SPARSE_LR = 1e-3       # train_sparse.py:164
SPARSE_EPOCHS = 2000   # train_sparse.py:172
TEST_EVERY = 10        # train_sparse.py:190


def epoch_batch_plan(n: int, bs: int):
    """(num_batches, pad): ceil-divide n samples into bs-sized scan steps.

    The permutation is padded by ``pad`` filler slots whose loss weight is 0,
    so one epoch touches every sample exactly once (no dropped remainder, no
    clamped-window overlap)."""
    num_batches = max(1, -(-n // bs))
    return num_batches, num_batches * bs - n


def sparse_dir(cfg, name_of_set: str) -> Path:
    return Path(cfg.CHALEARN.ROOT, cfg.MODEL.LOGS, "sparse_fusion", name_of_set)


class ResultSaver:
    """Dump per-part eval materials for fusion training."""

    def __init__(self, part_yamls: Optional[List[str]] = None, cfg_overrides=None,
                 trainer_factory=None):
        self.part_yamls = part_yamls or PART_YAMLS
        self.cfg_overrides = cfg_overrides or []
        # Injectable for tests; defaults to the real Trainer.
        if trainer_factory is None:
            from .trainer import Trainer

            trainer_factory = Trainer
        self.trainer_factory = trainer_factory

    def load_part_cfgs(self):
        for name in self.part_yamls:
            yield load_model_cfg(name, overrides=self.cfg_overrides)

    def save_network_output(self):
        from ..data.dataset import ChalearnVideoDataset, eval_batches

        for cfg in self.load_part_cfgs():
            trainer = self.trainer_factory(cfg)
            for name_of_set in ("train", "test"):
                # Uniform sampling, no shuffle, batch//3 (train_sparse.py:56-64).
                ds = ChalearnVideoDataset(cfg, name_of_set, sampling="uniform")
                bs = max(1, cfg.CHALEARN.BATCH_SIZE // 3)
                batches, sv = eval_batches(ds, bs)
                y = trainer.run_eval(batches=batches, samples_per_video=sv)
                out = sparse_dir(cfg, name_of_set) / cfg.MODEL.NAME
                out.parent.mkdir(parents=True, exist_ok=True)
                with out.open("wb") as f:
                    pickle.dump(y, f)
                print(f"saved {out} (acc {y['acc']:.3f})")


class SparseFusionDataset:
    """Stack part pickles: PS (P, N, C), T (N,), sv (videos,)."""

    def __init__(self, res_folder: Path) -> None:
        part_res = []
        for p in sorted(Path(res_folder).iterdir()):
            with p.open("rb") as f:
                part_res.append((p.stem, pickle.load(f)))
        part_res.sort(key=lambda x: x[0])
        assert part_res, f"no fusion materials in {res_folder}"
        self.part_names = [name for name, _ in part_res]
        t = np.stack([r["t"] for _, r in part_res])
        assert (t == t[0]).all(), "ground truth differs between parts"
        self.T = t[0].astype(np.int32)
        self.PS = np.stack([r["ps"] for _, r in part_res]).astype(np.float32)
        sv = [r["sv"] for _, r in part_res]
        assert all(list(s) == list(sv[0]) for s in sv)
        self.sv = np.asarray(sv[0], np.int32)
        self.num_part, self.num_n, self.num_class = self.PS.shape

    def as_arrays(self):
        # x: (N, P, C) like the reference's __getitem__ batches.
        return np.transpose(self.PS, (1, 0, 2)), self.T


class SparseTrainer:
    def __init__(self, cfg, batch_size: int = SPARSE_BATCH) -> None:
        self.cfg = cfg
        self.batch_size = batch_size
        self.train_dataset = SparseFusionDataset(sparse_dir(cfg, "train"))
        self.test_dataset = SparseFusionDataset(sparse_dir(cfg, "test"))
        self.model = SparseModel(
            self.train_dataset.num_class, self.train_dataset.num_part
        )
        x0, _ = self.train_dataset.as_arrays()
        self.params = self.model.init(jax.random.PRNGKey(0), jnp.asarray(x0[:1]))[
            "params"
        ]
        self.tx = optax.adam(SPARSE_LR)
        self.opt_state = self.tx.init(self.params)
        self.max_accuracy = 0.0
        self.ckpt_folder = Path(cfg.CHALEARN.ROOT, cfg.MODEL.LOGS, "sparse_fusion_ckpt")
        self.logger = MetricsLogger()
        self._epoch_fn = self._build_epoch_fn()

    def _build_epoch_fn(self):
        model, tx, bs = self.model, self.tx, self.batch_size
        x_all, t_all = self.train_dataset.as_arrays()
        n = x_all.shape[0]
        num_batches, pad = epoch_batch_plan(n, bs)
        x_dev = jnp.asarray(x_all)
        t_dev = jnp.asarray(t_all)
        # Position weights: the last `pad` slots of the padded permutation are
        # filler (index 0 repeated) and must not contribute loss — the
        # reference's DataLoader yields a short final batch instead
        # (train_sparse.py:153-182); masking is the static-shape equivalent.
        # Each sample is touched exactly once per epoch.
        pos_w = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])

        def epoch(params, opt_state, rng):
            perm = jax.random.permutation(rng, n)
            perm = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])

            def body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * bs, bs)
                wb = jax.lax.dynamic_slice_in_dim(pos_w, i * bs, bs)
                xb, tb = x_dev[idx], t_dev[idx]

                def loss_fn(p):
                    logits = model.apply({"params": p}, xb)
                    ce = optax.softmax_cross_entropy_with_integer_labels(logits, tb)
                    return jnp.sum(ce * wb) / jnp.maximum(jnp.sum(wb), 1.0)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(num_batches)
            )
            return params, opt_state, losses.mean()

        return jax.jit(epoch)

    def train(self, epochs: int = SPARSE_EPOCHS) -> float:
        rng = jax.random.PRNGKey(1)
        for epoch in range(epochs):
            rng, e_rng = jax.random.split(rng)
            self.params, self.opt_state, loss = self._epoch_fn(
                self.params, self.opt_state, e_rng
            )
            if (epoch + 1) % TEST_EVERY == 0:
                self.test(epoch)
        return self.max_accuracy

    def test(self, epoch: int = 0) -> float:
        x, t = self.test_dataset.as_arrays()
        logits = np.asarray(self.model.apply({"params": self.params}, jnp.asarray(x)))
        sv = list(self.test_dataset.sv)
        seg = segment_ids_from_counts(sv, len(t))
        acc, _ = per_video_accuracy(
            jnp.asarray(logits), jnp.asarray(t), jnp.asarray(seg), len(sv)
        )
        acc = float(acc)
        if acc > self.max_accuracy:
            self.save_ckpt(acc, epoch)
        self.max_accuracy = max(acc, self.max_accuracy)
        self.logger.log("sparse_test", epoch=epoch, acc=acc, best=self.max_accuracy)
        return acc

    def save_ckpt(self, acc: float, epoch: int):
        from flax import serialization

        self.ckpt_folder.mkdir(parents=True, exist_ok=True)
        path = self.ckpt_folder / ("acc-%.3f-epoch-%d" % (acc, epoch))
        path.write_bytes(serialization.to_bytes(jax.device_get(self.params)))
