"""Batch inference / serving API.

The reference's only inference surface is the leave-one-out ``test()`` loop
(reference: mcat/main.py:158-183). For production use this module provides a
``Predictor``: load a checkpoint (framework or reference ``.pt``), then score
whole datasets (bucketed, batched, jitted per bucket) or single bags.

CLI: ``python -m multimodal_path_omic_tpu.cli predict --config cfg.yaml
--checkpoint ck --out predictions.csv`` writes one row per slide with
hazards/survs/risk (survival models) or class probabilities (GE).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from multimodal_path_omic_tpu.config import Config
from multimodal_path_omic_tpu.data.bags import bucket_for, pad_bag
from multimodal_path_omic_tpu.data.pipeline import BucketBatcher, prefetch
from multimodal_path_omic_tpu.train.trainer import Trainer


class Predictor:
    """Inference-only wrapper around a trained model.

    Built from a Trainer (shares model/params/buckets); use
    ``Predictor.from_config`` for the common path.
    """

    def __init__(self, trainer: Trainer, param_sets=None):
        self._t = trainer
        # reuse the Trainer's program: same l1_lambda (a rebuilt step without
        # it reported losses disagreeing with Trainer.validate for lambda>0)
        # and no second per-bucket compile when one process validates AND
        # predicts
        self.eval_step = trainer.eval_step
        self._mc_steps: Dict[int, Any] = {}  # n_samples -> jitted MC step
        # checkpoint ensemble: >= 2 parameter pytrees sharing one program
        # (e.g. the k fold models from `cli cv`); outputs are the ensemble
        # mean of the members' probabilistic outputs
        self._param_sets = list(param_sets) if param_sets else None

    @property
    def n_members(self) -> int:
        return len(self._param_sets) if self._param_sets else 1

    @property
    def _min_rows(self) -> int:
        """Smallest servable batch: rows shard over the mesh data axis
        (parallel/mesh.py::batch_spec), so single-bag requests pad to
        ``data_axis`` zero-weight rows; 1 off-mesh."""
        t = self._t
        return t.config.tpu.data_axis if t.mesh is not None else 1

    def _eval(self, dev_batch) -> Dict[str, Any]:
        """One eval-program call (or one per ensemble member, merged).

        Ensemble merge averages the PROBABILISTIC outputs — hazards, survs,
        class probabilities — and re-derives risk from the averaged curve
        (risk = -sum survs, mcat/main.py:56), rather than averaging risks:
        the averaged survival curve is the ensemble's predictive
        distribution. ``risk_ens_std`` / ``y_ens_std`` report between-member
        spread."""
        t = self._t
        if not self._param_sets:
            return self.eval_step(t.state.params, dev_batch)
        outs = [self.eval_step(p, dev_batch) for p in self._param_sets]
        merged: Dict[str, Any] = {
            "loss": np.mean([float(o["loss"]) for o in outs]),
            "n_real": outs[0]["n_real"],
            "attention": None,
            "y": np.mean([np.asarray(o["y"]) for o in outs], axis=0),
        }
        if t.ge_mode:
            # GE's y IS the class-probability vector (double-softmax quirk,
            # ops/losses.py::cross_entropy_on_probs) — mean of probs
            merged["y_ens_std"] = np.std(
                [np.asarray(o["y"]) for o in outs], axis=0
            )
            return merged
        survs = np.mean([np.asarray(o["survs"]) for o in outs], axis=0)
        merged["survs"] = survs
        merged["hazards"] = np.mean(
            [np.asarray(o["hazards"]) for o in outs], axis=0
        )
        merged["risk"] = -np.sum(survs, axis=1)
        merged["risk_ens_std"] = np.std(
            [np.asarray(o["risk"]) for o in outs], axis=0
        )
        if "attn_loss" in outs[0]:
            merged["attn_loss"] = np.mean(
                [float(o["attn_loss"]) for o in outs]
            )
        return merged

    def _mc_step(self, n_samples: int):
        """Lazily-built MC-dropout step (train/loop.py::make_mc_eval_step),
        cached per sample count so repeated calls reuse the program."""
        if n_samples not in self._mc_steps:
            from multimodal_path_omic_tpu.train.loop import make_mc_eval_step

            t = self._t
            self._mc_steps[n_samples] = make_mc_eval_step(
                t.model, n_samples, ge_mode=t.ge_mode,
                omic_sizes=tuple(t.omic_sizes),
            )
        return self._mc_steps[n_samples]

    def _mc_augment(self, out, dev_batch, real, mc_samples, mc_seed, fold=0):
        """Run the MC-dropout step on an already-staged device batch and merge
        the de-batched uncertainty columns into ``out``. ``fold`` is the batch
        index within a dataset scan — folded into the key so every batch
        draws INDEPENDENT noise realizations (one shared key would repeat
        dropout masks across batches by row position)."""
        if self._param_sets:
            raise ValueError(
                "mc_samples with a checkpoint ensemble is not supported — "
                "the ensemble spread (risk_ens_std / y_ens_std) is already "
                "the uncertainty estimate"
            )
        import jax

        res = self._mc_step(mc_samples)(
            self._t.state.params, dev_batch,
            jax.random.fold_in(jax.random.key(mc_seed), fold),
        )
        keys = (
            ("y_mean", "y_std") if self._t.ge_mode
            else ("risk_mean", "risk_std", "survs_mean", "survs_std",
                  "hazards_mean", "y_mean", "y_std")
        )
        for k in keys:
            out[k] = np.asarray(res[k])[:real]
        return out

    @classmethod
    def from_config(
        cls,
        config: Config,
        checkpoint=None,
        torch_checkpoint=None,
        verbose: bool = False,
    ) -> "Predictor":
        """``checkpoint`` / ``torch_checkpoint`` accept a single path or a
        LIST of paths — two or more build a checkpoint ensemble (one shared
        eval program, outputs averaged across members), the natural way to
        serve the k fold models a `cli cv` run produces."""
        ckpts = (
            [checkpoint] if isinstance(checkpoint, str) else list(checkpoint or [])
        )
        t_ckpts = (
            [torch_checkpoint]
            if isinstance(torch_checkpoint, str)
            else list(torch_checkpoint or [])
        )
        trainer = Trainer(config, verbose=verbose)
        param_sets = []
        for path in ckpts:
            trainer.restore(path)
            param_sets.append(trainer.state.params)
        for path in t_ckpts:
            trainer.load_torch_checkpoint(path)
            param_sets.append(trainer.state.params)
        if len(param_sets) >= 2:
            return cls(trainer, param_sets=param_sets)
        return cls(trainer)

    # ------------------------------------------------------------------ warmup
    def warmup(self, buckets=None, verbose: bool = False) -> list:
        """Pre-compile the per-bucket eval programs with dummy batches so the
        FIRST real request doesn't pay the jit compile (seconds to minutes
        per bucket on cold caches — see bench_serving first_request_s).
        Returns the warmed bucket list."""
        t = self._t
        dim = int(t.state.params["H"]["fc"]["kernel"].shape[0])
        warmed = []
        for bucket in sorted(set(buckets or t.buckets)):
            # jit caches per SHAPE: predict_bag runs B=_min_rows (1, or
            # data_axis on a mesh), predict_bags runs B=batch_size — warm
            # both programs
            for n in sorted({self._min_rows, t.batch_size}):
                batch: Dict[str, Any] = {
                    "wsi": np.zeros((n, bucket, dim), np.float32),
                    "mask": np.zeros((n, bucket), bool),
                    "label": np.zeros((n,), np.int32),
                    "weight": np.zeros((n,), np.float32),
                }
                if not t.ge_mode:
                    batch["omics"] = [
                        np.zeros((n, s), np.float32) for s in t.omic_sizes
                    ]
                    batch["censorship"] = np.zeros((n,), np.float32)
                    batch["survival_months"] = np.zeros((n,), np.float32)
                res = self.eval_step(t.state.params, t._device_batch(batch))
                np.asarray(res["y"])  # block until the compile+run completes
                warmed.append((bucket, n))
            if verbose:
                print(f"warmed bucket {bucket}")
        return warmed

    # ------------------------------------------------------------------ single
    def predict_bag(
        self, bag: np.ndarray, omics=None,
        mc_samples: int = 0, mc_seed: int = 0,
    ) -> Dict[str, np.ndarray]:
        """Score one bag [M, 1024] (+ omics signature list for survival models).

        The bag is padded to its bucket; outputs are de-batched. On a
        data-parallel mesh the batch is additionally padded to ``data_axis``
        zero-weight rows (batch rows shard over the data axis, so B=1 cannot
        be laid out) — the de-batch drops the padding rows.
        ``mc_samples`` > 0 adds MC-dropout predictive uncertainty columns
        (risk_mean/risk_std/... — see make_mc_eval_step) from that many
        stochastic forwards seeded by ``mc_seed``.
        """
        t = self._t
        n = self._min_rows
        bucket = bucket_for(bag.shape[0], t.buckets)
        padded, mask = pad_bag(np.asarray(bag, np.float32), bucket)
        wsi = np.zeros((n,) + padded.shape, np.float32)
        wsi[0] = padded
        msk = np.zeros((n,) + mask.shape, bool)
        msk[0] = mask
        batch: Dict[str, Any] = {
            "wsi": wsi,
            "mask": msk,
            "label": np.zeros((n,), np.int32),
            "weight": (np.arange(n) < 1).astype(np.float32),
        }
        if not t.ge_mode:
            if omics is None:
                raise ValueError("survival models need the omics signature list")
            batch["omics"] = [
                np.concatenate(
                    [np.asarray(o, np.float32)[None],
                     np.zeros((n - 1, np.asarray(o).shape[-1]), np.float32)]
                )
                for o in omics
            ]
            batch["censorship"] = np.zeros((n,), np.float32)
            batch["survival_months"] = np.zeros((n,), np.float32)
        dev = t._device_batch(batch)
        out = self._debatch(self._eval(dev), 1)
        if mc_samples > 0:
            out = self._mc_augment(out, dev, 1, mc_samples, mc_seed)
        return out

    # ------------------------------------------------------------------ multi
    def predict_bags(self, bags, omics=None) -> Dict[str, np.ndarray]:
        """Score a list of bags in bucketed, FIXED-SHAPE batches.

        ``bags``: list of [M_i, D] arrays; ``omics``: per-bag signature lists
        (survival models) or None (GE). Bags are grouped by bucket and padded
        to ``(batch_size, bucket, D)`` — the exact shapes the dataset path
        compiles — so arbitrary request sizes reuse the per-bucket programs
        instead of compiling per request size. Outputs are row-aligned with
        the input order. Amortizes dispatch + HTTP overhead over the batch vs
        per-bag ``predict_bag`` calls.
        """
        t = self._t
        n = len(bags)
        if n == 0:
            return {}
        if not t.ge_mode and (omics is None or len(omics) != n):
            raise ValueError("survival models need one omics signature list per bag")
        by_bucket: Dict[int, list] = {}
        for i, bag in enumerate(bags):
            by_bucket.setdefault(bucket_for(len(bag), t.buckets), []).append(i)
        slots: Dict[str, list] = {}
        bsz = t.batch_size
        dim = int(np.asarray(bags[0]).shape[1])
        for bucket, idxs in sorted(by_bucket.items()):
            for c0 in range(0, len(idxs), bsz):
                chunk = idxs[c0 : c0 + bsz]
                wsi = np.zeros((bsz, bucket, dim), np.float32)
                mask = np.zeros((bsz, bucket), bool)
                for row, i in enumerate(chunk):
                    padded, m = pad_bag(np.asarray(bags[i], np.float32), bucket)
                    wsi[row], mask[row] = padded, m
                batch: Dict[str, Any] = {
                    "wsi": wsi,
                    "mask": mask,
                    "label": np.zeros((bsz,), np.int32),
                    "weight": (np.arange(bsz) < len(chunk)).astype(np.float32),
                }
                if not t.ge_mode:
                    batch["omics"] = [
                        np.stack(
                            [np.asarray(omics[i][j], np.float32) for i in chunk]
                            + [np.zeros((s,), np.float32)] * (bsz - len(chunk))
                        )
                        for j, s in enumerate(t.omic_sizes)
                    ]
                    batch["censorship"] = np.zeros((bsz,), np.float32)
                    batch["survival_months"] = np.zeros((bsz,), np.float32)
                res = self._eval(t._device_batch(batch))
                out = self._debatch(res, len(chunk))
                for k, v in out.items():
                    slots.setdefault(k, [None] * n)
                    for row, i in enumerate(chunk):
                        slots[k][i] = v[row]
        return {k: np.stack(v) for k, v in slots.items()}

    # ----------------------------------------------------------------- dataset
    def predict_dataset(
        self, dataset=None, mc_samples: int = 0, mc_seed: int = 0,
    ) -> Dict[str, np.ndarray]:
        """Score every sample of a dataset (defaults to the full config
        dataset); returns column arrays aligned with ``slide_id``.
        ``mc_samples`` > 0 adds MC-dropout uncertainty columns per sample."""
        t = self._t
        if dataset is None:
            dataset = t.dataset
        batcher = BucketBatcher(
            dataset,
            t.extras_fn,
            t.batch_size,
            t.buckets,
            shuffle=False,
        )
        # safe: every batch goes through t._device_batch, which closes the
        # pipeline's slot-aliasing hazard before the slot can recycle
        # (single-CPU hosts keep the plain path — see Trainer.__init__)
        import os as _os

        batcher.use_native_pipeline = (
            t.config.tpu.use_native_pipeline and (_os.cpu_count() or 1) >= 2
        )
        rows: Dict[str, list] = {}

        # transfer in the prefetch thread so host IO overlaps device compute
        def _staged(batches):
            for b in batches:
                yield b, t._device_batch(b)

        for bi, (batch, dev) in enumerate(
            prefetch(_staged(batcher.batches()), depth=t.config.tpu.prefetch)
        ):
            real = int(batch["weight"].sum())
            res = self._eval(dev)
            out = self._debatch(res, real)
            if mc_samples > 0:
                out = self._mc_augment(out, dev, real, mc_samples, mc_seed, fold=bi)
            out["slide_id"] = np.array(
                [dataset.slide_id(int(i)) for i in batch["index"][:real]]
            )
            for k, v in out.items():
                rows.setdefault(k, []).append(v)
        return {k: np.concatenate(v) for k, v in rows.items()}

    def predict_to_csv(
        self, path: str, dataset=None, mc_samples: int = 0, mc_seed: int = 0,
    ) -> str:
        import pandas as pd

        cols = self.predict_dataset(dataset, mc_samples=mc_samples, mc_seed=mc_seed)
        flat: Dict[str, Any] = {"slide_id": cols["slide_id"]}
        if "risk" in cols:
            flat["risk"] = cols["risk"]
            for j in range(cols["hazards"].shape[1]):
                flat[f"hazard_{j}"] = cols["hazards"][:, j]
                flat[f"surv_{j}"] = cols["survs"][:, j]
        for j in range(cols["y"].shape[1]):
            flat[f"y_{j}"] = cols["y"][:, j]
        if mc_samples > 0:
            if "risk_std" in cols:
                flat["risk_mc_mean"] = cols["risk_mean"]
                flat["risk_mc_std"] = cols["risk_std"]
            for j in range(cols["y_std"].shape[1]):
                flat[f"y_{j}_mc_std"] = cols["y_std"][:, j]
        if "risk_ens_std" in cols:
            flat["risk_ens_std"] = cols["risk_ens_std"]
        if "y_ens_std" in cols:
            for j in range(cols["y_ens_std"].shape[1]):
                flat[f"y_{j}_ens_std"] = cols["y_ens_std"][:, j]
        pd.DataFrame(flat).to_csv(path, index=False)
        return path

    # ------------------------------------------------------------------- util
    def _debatch(self, res, real: int) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {"y": np.asarray(res["y"])[:real]}
        if not self._t.ge_mode:
            out["risk"] = np.asarray(res["risk"])[:real]
            out["hazards"] = np.asarray(res["hazards"])[:real]
            out["survs"] = np.asarray(res["survs"])[:real]
        for k in ("risk_ens_std", "y_ens_std"):  # ensemble member spread
            if k in res:
                out[k] = np.asarray(res[k])[:real]
        return out
