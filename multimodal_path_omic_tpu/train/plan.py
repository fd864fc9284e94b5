"""AOT memory-fit planner: predict device-memory needs before training.

A v5e chip has 16 GiB of HBM; the practical question before any long run is
"do params + optimizer state + device cache + the step's working set fit?".
The reference answers it by OOMing mid-epoch (its lazy data loading means
the first over-budget bag only appears when reached). Here jax's AOT path
answers it without executing a step: ``jit(step).lower(abstract
args).compile()`` yields XLA's own byte accounting per bucket program
(``CompiledMemoryStats``: argument / output / temp / peak), the
device-cache sizing helpers report the would-be cache footprint
(data/device_cache.py::bucket_bytes), and the report compares the sum
against the device's HBM limit (``memory_stats()['bytes_limit']`` where
the backend exposes it, else the 16 GiB v5e default).

Approximations, stated in the report: the host-fed train step is what gets
AOT-compiled (the cached-path step gathers its batch out of the cache pool,
so its extra working set is about one batch — already inside the host-fed
program's argument bytes); on meshes the cache shards its patch axis over
all devices (per-device = total / n) and batches shard over ``data``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_V5E_HBM = 16 * (1 << 30)  # bytes_limit fallback when the backend hides it


def _tree_bytes(tree) -> int:
    return int(sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)))


def _stats_dict(ma) -> Dict[str, int]:
    arg = int(getattr(ma, "argument_size_in_bytes", 0))
    out = int(getattr(ma, "output_size_in_bytes", 0))
    tmp = int(getattr(ma, "temp_size_in_bytes", 0))
    peak = int(getattr(ma, "peak_memory_in_bytes", 0)) or (arg + out + tmp)
    return {"argument": arg, "output": out, "temp": tmp, "peak": peak}


def _abstract_batch(
    bucket: int, batch_size: int, dim: int, omic_total: int,
    ge_mode: bool, transfer_dtype: str,
) -> Dict[str, Any]:
    """ShapeDtypeStructs mirroring Trainer._device_batch's host-fed layout."""
    wsi_dtype = {"bfloat16": jnp.bfloat16, "int8": jnp.int8}.get(
        transfer_dtype, jnp.float32
    )
    b = {
        "wsi": jax.ShapeDtypeStruct((batch_size, bucket, dim), wsi_dtype),
        "mask": jax.ShapeDtypeStruct((batch_size, bucket), jnp.bool_),
        "label": jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        "weight": jax.ShapeDtypeStruct((batch_size,), jnp.float32),
    }
    if transfer_dtype == "int8":
        b["wsi_scale"] = jax.ShapeDtypeStruct((batch_size, bucket), jnp.float32)
    if not ge_mode:
        b["omics_packed"] = jax.ShapeDtypeStruct(
            (batch_size, omic_total), jnp.float32
        )
        b["censorship"] = jax.ShapeDtypeStruct((batch_size,), jnp.float32)
        b["survival_months"] = jax.ShapeDtypeStruct((batch_size,), jnp.float32)
    return b


def memory_plan(config, trainer=None) -> Dict[str, Any]:
    """Compute the memory-fit report for ``config``. Builds a Trainer (no
    epoch runs, no cache upload) unless one is passed in."""
    from multimodal_path_omic_tpu.data.device_cache import DeviceBagCache

    if trainer is None:
        from multimodal_path_omic_tpu.train.trainer import Trainer

        trainer = Trainer(config, verbose=False)
    c = trainer.config

    dev = jax.devices()[0]
    hbm = None
    try:
        stats = dev.memory_stats()
        if stats:
            hbm = int(stats.get("bytes_limit") or 0) or None
    except Exception:
        pass
    hbm_assumed = hbm is None
    if hbm is None:
        hbm = _V5E_HBM

    params_b = _tree_bytes(trainer.state.params)
    opt_b = _tree_bytes(trainer.state.opt_state)

    # ---- device cache footprint: the SAME budget-fit policy the Trainer
    # runs (plan_cache_fit), so forced caches ("device_cache: on" ignores
    # the budget) and greedy partial caches are predicted, not guessed
    from multimodal_path_omic_tpu.data.bags import bucket_for
    from multimodal_path_omic_tpu.data.device_cache import plan_cache_fit

    lengths = trainer.train_batcher._bag_lengths()
    val_lengths = (
        trainer.val_batcher._bag_lengths() if len(trainer.val_ds) else np.zeros(0)
    )
    all_lengths = np.concatenate([lengths, val_lengths])
    dim = int(trainer.train_ds.bag(0).shape[1]) if len(trainer.train_ds) else 1024
    per_bucket_cache = DeviceBagCache.bucket_bytes(
        all_lengths, trainer.buckets, dim, store_dtype=trainer.cache_dtype
    )
    cache_total = sum(per_bucket_cache.values())
    n_mesh = 1 if trainer.mesh is None else int(
        np.prod(list(trainer.mesh.shape.values()))
    )
    budget = c.tpu.device_cache_budget_bytes  # per-device budget semantics
    counts: Dict[int, int] = {}
    for m in all_lengths:
        b = bucket_for(int(m), trainer.buckets)
        counts[b] = counts.get(b, 0) + 1
    cache_wanted = trainer._want_device_cache
    cache_only, cache_resident, cache_engaged = (
        plan_cache_fit(
            per_bucket_cache, counts, budget * n_mesh,
            forced=trainer._device_cache_forced,
            multi_host=trainer.n_processes > 1,
        )
        if cache_wanted
        else (None, 0, False)
    )
    cache_per_device = cache_resident // n_mesh
    cache_fits = cache_total <= budget * n_mesh

    # ---- AOT per-bucket step programs. On meshes the abstract batch gets
    # the canonical shardings (parallel/mesh.py::batch_spec) so XLA's byte
    # accounting reflects PER-DEVICE buffers, not the global batch.
    omic_total = int(sum(trainer.omic_sizes))
    buckets_used = sorted(per_bucket_cache) or list(trainer.buckets[:1])
    rows = []
    for bucket in buckets_used:
        ab = _abstract_batch(
            bucket, c.tpu.batch_size, dim, omic_total,
            trainer.ge_mode, trainer.transfer_dtype,
        )
        if trainer.mesh is not None:
            from jax.sharding import NamedSharding

            from multimodal_path_omic_tpu.parallel.mesh import batch_spec

            ab = {
                k: jax.ShapeDtypeStruct(
                    v.shape, v.dtype,
                    sharding=NamedSharding(trainer.mesh, batch_spec(k)),
                )
                for k, v in ab.items()
            }
        row: Dict[str, Any] = {"bucket": int(bucket)}
        try:
            ma = trainer.train_step.lower(trainer.state, ab).compile().memory_analysis()
            row.update(_stats_dict(ma))
        except Exception as e:  # pragma: no cover - backend-specific
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)

    peak_step = max((r.get("peak", 0) for r in rows), default=0)
    # resident cache (per device) + the worst bucket program's own peak
    # (whose argument bytes already include params/opt state and one batch)
    est_peak = cache_per_device + peak_step
    return {
        "backend": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "hbm_bytes": hbm,
        "hbm_assumed": hbm_assumed,
        "params_bytes": params_b,
        "opt_state_bytes": opt_b,
        "n_bags": int(all_lengths.size),
        "cache_dtype": trainer.cache_dtype,
        "cache_bytes_per_bucket": {int(k): int(v) for k, v in per_bucket_cache.items()},
        "cache_bytes_total": int(cache_total),
        "cache_resident_bytes": int(cache_resident),
        "cache_bytes_per_device": int(cache_per_device),
        "cache_wanted": bool(cache_wanted),
        "cache_engaged": bool(cache_engaged),
        "cache_partial_buckets": (
            None if cache_only is None else [int(b) for b in cache_only]
        ),
        "cache_budget_bytes": int(budget),
        "cache_fits_budget": bool(cache_fits),
        "n_mesh_devices": n_mesh,
        "batch_size": int(c.tpu.batch_size),
        "transfer_dtype": trainer.transfer_dtype,
        "step_programs": rows,
        "estimated_peak_bytes": int(est_peak),
        "fits": bool(est_peak <= hbm),
        "cpu_backend_note": jax.default_backend() == "cpu",
    }


def _mib(n: int) -> str:
    return f"{n / (1 << 20):,.1f} MiB"


def format_plan(plan: Dict[str, Any]) -> str:
    lines = []
    hbm_src = "assumed v5e default" if plan["hbm_assumed"] else "reported by backend"
    lines.append(
        f"device: {plan['device_kind']} ({plan['backend']}), "
        f"HBM {_mib(plan['hbm_bytes'])} ({hbm_src})"
    )
    lines.append(
        f"params {_mib(plan['params_bytes'])} + optimizer state "
        f"{_mib(plan['opt_state_bytes'])}"
    )
    mesh_note = (
        f" (/{plan['n_mesh_devices']} mesh devices = "
        f"{_mib(plan['cache_bytes_per_device'])}/device)"
        if plan["n_mesh_devices"] > 1 else ""
    )
    fit = "fits" if plan["cache_fits_budget"] else "OVER"
    if not plan["cache_wanted"]:
        mode = "disabled in config — host feeding"
    elif not plan["cache_engaged"]:
        mode = "would NOT engage — host feeding"
    elif plan["cache_partial_buckets"] is not None:
        mode = (
            f"PARTIAL: buckets {plan['cache_partial_buckets']} resident "
            f"({_mib(plan['cache_resident_bytes'])}), overflow host-feeds"
        )
    else:
        mode = "full cache resident"
    lines.append(
        f"device cache ({plan['cache_dtype']}, {plan['n_bags']} bags): "
        f"{_mib(plan['cache_bytes_total'])}{mesh_note} — {fit} the "
        f"{_mib(plan['cache_budget_bytes'])} budget; {mode}"
    )
    lines.append(
        f"step programs (AOT-compiled, batch {plan['batch_size']}, "
        f"{plan['transfer_dtype']} feed):"
    )
    for r in plan["step_programs"]:
        if "error" in r:
            lines.append(f"  bucket {r['bucket']:>6}: lowering failed — {r['error']}")
        else:
            lines.append(
                f"  bucket {r['bucket']:>6}: peak {_mib(r['peak'])} "
                f"(arguments {_mib(r['argument'])}, temp {_mib(r['temp'])}, "
                f"output {_mib(r['output'])})"
            )
    verdict = "FITS" if plan["fits"] else "DOES NOT FIT"
    lines.append(
        f"estimated peak (cache resident + worst step program): "
        f"{_mib(plan['estimated_peak_bytes'])} of {_mib(plan['hbm_bytes'])} "
        f"— {verdict}"
    )
    if plan["cpu_backend_note"]:
        lines.append(
            "note: CPU backend — XLA:CPU reports argument/output sizes but "
            "usually zero temp; run on the TPU for authoritative numbers"
        )
    return "\n".join(lines)
