"""Ahead-of-time model export for deployment (jax.export / StableHLO).

The reference has NO deployment surface: its only inference path is the
in-process leave-one-out ``test()`` loop (reference: mcat/main.py:158-183),
which needs the full torch module zoo + checkpoint machinery in the serving
process. TPU-natively, a trained model IS a compiled XLA program —
``jax.export`` serializes the lowered StableHLO with the trained parameters
baked in as constants, so a consumer scores bags with ZERO framework code:
no flax models, no config system, no checkpoint restore — just the jax
runtime and this bundle.

Bundle layout (one directory):

    manifest.json                  model / bucket / omics metadata
    b{bucket}_n{batch}.jaxexport   serialized forward program per
                                   (bucket, batch_size) pair

Artifacts are exported for BOTH ``cpu`` and ``tpu`` by default: the same
bundle validates on a CPU host and serves on chips (cross-platform lowering
is ahead-of-time; no TPU is needed to export). Programs take
``(wsi [N, bucket, D] f32, mask [N, bucket] bool, *omics [N, s_i] f32)`` and
return ``{"hazards", "survs", "y", "risk"}`` (survival) or ``{"y"}`` (GE) —
the same output contract as serve.Predictor.

CLI: ``python -m multimodal_path_omic_tpu.cli export-model --config cfg.yaml
--checkpoint ck --out bundle_dir``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def _infer_fn(model, params, ge_mode: bool):
    """Deterministic forward with the trained params closed over (baked into
    the exported program as constants — the bundle is self-contained).

    bf16-stored params upcast to f32 INSIDE the traced fn: the artifact then
    carries bf16 constants (half the bytes) while every matmul/activation
    still computes in f32 — a storage cast, not a compute cast."""
    import jax
    import jax.numpy as jnp

    def _params32():
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(jnp.float32), params
        )

    if ge_mode:

        def fn(wsi, mask):
            y, _ = model.apply(
                {"params": _params32()}, wsi, mask, deterministic=True
            )
            return {"y": y}

        return fn

    def fn(wsi, mask, *omics):
        out = model.apply(
            {"params": _params32()}, wsi, list(omics), mask, deterministic=True
        )
        # risk = -sum(survs): the reference's risk score (mcat/main.py:148)
        return {
            "hazards": out.hazards,
            "survs": out.survs,
            "y": out.y,
            "risk": -jnp.sum(out.survs, axis=1),
        }

    return fn


def export_model(
    trainer,
    out_dir: str,
    *,
    buckets: Optional[Sequence[int]] = None,
    batch_sizes: Sequence[int] = (1,),
    platforms: Sequence[str] = ("cpu", "tpu"),
    max_bag: Optional[int] = None,
    weights_dtype: str = "float32",
) -> Dict:
    """Export the trainer's (trained) model as a self-contained bundle.

    One artifact per (bucket, batch_size): fixed shapes are what XLA compiles
    anyway (the dataset path buckets bags identically), and enumerating them
    here means the serving side never traces or retraces Python.

    ``max_bag``: the in-framework path handles bags beyond the largest
    configured bucket by rounding up to a multiple of it and jitting on the
    fly (data/bags.py::bucket_for); an AOT bundle cannot compile at serving
    time, so pass the largest bag you expect and the rounded-up buckets are
    exported here. Programs consume raw f32 bags — the bundle path is exact
    vs a default-feed Predictor; tpu.transfer_dtype=int8 configs quantize
    host-side and will differ within quantization error.

    ``weights_dtype``: "bfloat16" stores the baked weight constants in bf16
    (~half the artifact bytes per program) and upcasts to f32 inside the
    program — compute stays f32; outputs differ from the f32 bundle only by
    bf16 weight rounding (tolerance-pinned in tests/test_deploy.py).
    """
    import jax
    from jax import export as jexport

    from multimodal_path_omic_tpu.data.bags import bucket_for

    if weights_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f'weights_dtype must be "float32" or "bfloat16", got {weights_dtype!r}'
        )
    model = trainer.model.clone(use_pallas=False, ring_mesh=None)
    # de-shard / materialize params on host so exported constants never carry
    # mesh placement from a distributed training run
    params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    dim = int(params["H"]["fc"]["kernel"].shape[0])  # WSIEncoder input width
    if weights_dtype == "bfloat16":
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda x: np.asarray(jnp.asarray(x).astype(jnp.bfloat16)), params
        )
    buckets = tuple(int(b) for b in (buckets or trainer.buckets))
    if max_bag is not None and max_bag > buckets[-1]:
        largest = buckets[-1]
        extra = range(2 * largest, bucket_for(int(max_bag), buckets) + 1, largest)
        buckets = buckets + tuple(extra)
    batch_sizes = tuple(int(n) for n in batch_sizes)
    ge_mode = bool(trainer.ge_mode)
    omic_sizes = () if ge_mode else tuple(int(s) for s in trainer.omic_sizes)

    fn = _infer_fn(model, params, ge_mode)
    os.makedirs(out_dir, exist_ok=True)
    artifacts: Dict[str, str] = {}
    for bucket in buckets:
        for n in batch_sizes:
            args = (
                jax.ShapeDtypeStruct((n, bucket, dim), np.float32),
                jax.ShapeDtypeStruct((n, bucket), bool),
            ) + tuple(
                jax.ShapeDtypeStruct((n, s), np.float32) for s in omic_sizes
            )
            exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(*args)
            name = f"b{bucket}_n{n}.jaxexport"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            artifacts[f"{bucket}:{n}"] = name

    manifest = {
        "format_version": _FORMAT_VERSION,
        "model": type(trainer.model).__name__,
        "n_params": int(trainer.n_params),
        "weights_dtype": weights_dtype,
        "ge_mode": ge_mode,
        "dim": dim,
        "omic_sizes": list(omic_sizes),
        "buckets": list(buckets),
        "batch_sizes": list(batch_sizes),
        "platforms": list(platforms),
        "outputs": ["y"] if ge_mode else ["hazards", "survs", "y", "risk"],
        "artifacts": artifacts,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedModel:
    """Scores bags from an exported bundle — no model code, no checkpoint.

    Deserialized programs are cached per (bucket, batch_size); padding and
    bucket selection reuse the in-framework primitives (data/bags.py), so
    predictions are identical to a default-feed serve.Predictor
    (equality-pinned in tests/test_deploy.py). Two documented deltas: bags
    beyond the exported bucket grid raise instead of jitting a new shape
    (AOT — see export_model's ``max_bag``), and ``tpu.transfer_dtype=int8``
    configs quantize host-side so the framework path differs within
    quantization error (the bundle always consumes raw f32).
    """

    def __init__(self, bundle_dir: str):
        with open(os.path.join(bundle_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported bundle format {self.manifest.get('format_version')!r}"
            )
        self._dir = bundle_dir
        self._programs: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------------ utils
    def _program(self, bucket: int, n: int):
        key = (bucket, n)
        if key not in self._programs:
            from jax import export as jexport

            name = self.manifest["artifacts"].get(f"{bucket}:{n}")
            if name is None:
                raise ValueError(
                    f"bundle has no program for bucket={bucket} batch={n}; "
                    f"available: {sorted(self.manifest['artifacts'])}"
                )
            with open(os.path.join(self._dir, name), "rb") as f:
                self._programs[key] = jexport.deserialize(bytearray(f.read()))
        return self._programs[key]

    def _bucket_for(self, m: int) -> int:
        # same selection as the in-framework path (data/bags.py::bucket_for);
        # but an AOT bundle cannot jit a new shape at serving time, so a bag
        # beyond the exported grid is an explicit error with the remedy
        from multimodal_path_omic_tpu.data.bags import bucket_for

        bucket = bucket_for(m, sorted(self.manifest["buckets"]))
        if bucket not in self.manifest["buckets"]:
            raise ValueError(
                f"bag of {m} patches needs bucket {bucket}, which this bundle "
                f"does not carry (buckets: {sorted(self.manifest['buckets'])});"
                " re-export with export-model --max-bag"
            )
        return bucket

    # ----------------------------------------------------------------- warmup
    def warmup(self, verbose: bool = False) -> list:
        """Deserialize + execute every (bucket, batch_size) program once with
        zeros, so the first real request doesn't pay the compile."""
        man = self.manifest
        warmed = []
        for key in sorted(man["artifacts"]):
            bucket, n = (int(x) for x in key.split(":"))
            args = [
                np.zeros((n, bucket, man["dim"]), np.float32),
                np.zeros((n, bucket), bool),
            ] + [np.zeros((n, s), np.float32) for s in man["omic_sizes"]]
            res = self._program(bucket, n).call(*args)
            np.asarray(res["y"])  # block until compile+run completes
            warmed.append((bucket, n))
            if verbose:
                print(f"warmed bucket {bucket} batch {n}")
        return warmed

    # ---------------------------------------------------------------- scoring
    def predict_bag(self, bag, omics=None) -> Dict[str, np.ndarray]:
        """Score one bag [M, D] (+ per-signature omics list for survival
        models); returns de-batched output arrays."""
        out = self.predict_bags([bag], None if omics is None else [omics])
        return {k: v[0] for k, v in out.items()}

    def predict_bags(self, bags, omics=None) -> Dict[str, np.ndarray]:
        """Score a list of bags, grouped into the bundle's fixed-shape
        (bucket, batch_size) programs; outputs are row-aligned with input."""
        from multimodal_path_omic_tpu.data.bags import pad_bag

        man = self.manifest
        n_bags = len(bags)
        if n_bags == 0:
            return {}
        if not man["ge_mode"] and (omics is None or len(omics) != n_bags):
            raise ValueError("survival bundles need one omics list per bag")
        dim = man["dim"]
        sizes = sorted(man["batch_sizes"])
        by_bucket: Dict[int, list] = {}
        for i, bag in enumerate(bags):
            by_bucket.setdefault(self._bucket_for(len(bag)), []).append(i)
        slots: Dict[str, list] = {k: [None] * n_bags for k in man["outputs"]}
        for bucket, idxs in sorted(by_bucket.items()):
            c0 = 0
            while c0 < len(idxs):
                left = len(idxs) - c0
                # smallest exported batch size that covers the remainder
                # (falls back to the largest, chunking)
                n = next((s for s in sizes if s >= left), sizes[-1])
                chunk = idxs[c0 : c0 + n]
                c0 += len(chunk)
                wsi = np.zeros((n, bucket, dim), np.float32)
                mask = np.zeros((n, bucket), bool)
                for row, i in enumerate(chunk):
                    # the SAME padding the in-framework path applies
                    wsi[row], mask[row] = pad_bag(
                        np.asarray(bags[i], np.float32), bucket
                    )
                args = [wsi, mask]
                if not man["ge_mode"]:
                    for j, s in enumerate(man["omic_sizes"]):
                        col = np.zeros((n, s), np.float32)
                        for row, i in enumerate(chunk):
                            col[row] = np.asarray(omics[i][j], np.float32)
                        args.append(col)
                res = self._program(bucket, n).call(*args)
                for k in man["outputs"]:
                    v = np.asarray(res[k])
                    for row, i in enumerate(chunk):
                        slots[k][i] = v[row]
        return {k: np.stack(v) for k, v in slots.items()}


def load_exported(bundle_dir: str) -> ExportedModel:
    return ExportedModel(bundle_dir)
