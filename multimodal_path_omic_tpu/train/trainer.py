"""Trainer — the unified driver replacing the reference's three main.py files.

The reference duplicates ~90% of its epoch/train/validate/test/checkpoint code
across models/mcat/main.py, models/nacagat/main.py and models/ge_nacagat/
main.py (SURVEY.md §2.7). Here a single Trainer drives every model family:

* dataset build + seeded patient split (+ leave-one-out) — mcat/main.py:239-252
* model build from config with ``omic_sizes = dataset.signature_sizes``
  — mcat/main.py:254-259
* loss/optimizer/scheduler factories — mcat/main.py:270-307
* epoch loop: train -> validate -> optional leave-one-out test with periodic
  attention export -> final validation — mcat/main.py:320-337
* checkpoint save/restore with full state (params, opt, rng, epoch)
  — mcat/main.py:88-100, 261-266, 309-312
* metrics: censored c-index on host over per-sample risks — mcat/main.py:76-81

TPU-shaped execution: batches are whole optimizer steps (bucketed, padded,
masked), jitted once per bucket; host pipeline prefetches while the device
computes; optional data-parallel sharding over a mesh (parallel/mesh.py).
"""

from __future__ import annotations

import math
import os
import sys
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_path_omic_tpu.config import Config
from multimodal_path_omic_tpu.data.bags import DEFAULT_BUCKETS
from multimodal_path_omic_tpu.data.dataset import GeneExprDataset, MultimodalDataset
from multimodal_path_omic_tpu.data.pipeline import (
    BucketBatcher,
    gene_expr_extras,
    prefetch,
    survival_extras,
)
from multimodal_path_omic_tpu.models import build_model
from multimodal_path_omic_tpu.train import checkpoint as ckpt
from multimodal_path_omic_tpu.train.logging import MetricLogger, StepTimer
from multimodal_path_omic_tpu.train.loop import (
    TrainState,
    make_eval_step,
    make_multi_eval_step,
    make_multi_train_step,
    make_train_step,
    stack_batches,
)
from multimodal_path_omic_tpu.train.metrics import concordance_index_censored
from multimodal_path_omic_tpu.train.optim import (
    current_lr,
    make_optimizer,
    schedule_lr,
    set_lr,
    step_exponential,
)


# One jit instance; jax caches compilations per (arity, shapes). The caller
# sorts leaves by size so the signature is order-invariant, and bounds the
# number of distinct signatures it will compile (_PACK_SIG_CAP) — with
# multi-bucket shuffled epochs the dispatch-group pattern varies per epoch,
# and an unbounded jit here would recompile every epoch.
@jax.jit
def _pack_leaves(*xs):
    return jnp.concatenate([jnp.ravel(x) for x in xs])


_PACK_SIG_CAP = 4


def set_compilation_cache_dir(path: str) -> None:
    """Point jax's persistent XLA compile cache at ``path``, effective NOW.

    ``jax.config.update("jax_compilation_cache_dir", ...)`` alone is not
    enough once the process has already touched the cache: jax initializes
    its cache object at most once, so a later dir change is silently ignored
    (reads and writes keep hitting the old dir). Resetting the internal cache
    makes the redirect take effect for in-process re-configuration (config
    sweeps, serving restarts, tests)."""
    if jax.config.jax_compilation_cache_dir == path:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    try:
        from jax._src import compilation_cache as _jcc

        _jcc.reset_cache()
    except Exception:  # pragma: no cover - internal API drift
        pass


# Auto multi-step dispatch: max stacked-bag bytes per device call on the
# host-fed path (the device-cache path stacks only KB-sized index metas).
_SPD_STACK_BYTES = 1 << 30


def _grouped(items, key_fn, K, k_fn=None):
    """Group consecutive items sharing key_fn(item) into runs of exactly
    k (k = k_fn(first) or K); leftovers flush down a fixed size ladder
    (k, 8, 1) so short runs still amortize dispatch without creating a jit
    trace per odd group size — at most 3 group shapes exist per bucket."""

    def _flush(pend, k):
        # leftover run: largest ladder sizes first (8-chunks, then singles)
        for size in (8, 1):
            if size >= k:
                continue
            while len(pend) >= size:
                yield pend[:size]
                pend = pend[size:]
        for p in pend:
            yield [p]

    pend = []
    k_cur = K
    for it in items:
        if pend and key_fn(it) != key_fn(pend[0]):
            yield from _flush(pend, k_cur)
            pend = []
        if not pend:
            k_cur = k_fn(it) if k_fn is not None else K
        pend.append(it)
        if len(pend) >= k_cur:
            yield pend
            pend = []
    yield from _flush(pend, k_cur)


def _own_aliased(batches):
    """Take ownership of pipelined slot views BEFORE any buffering.

    A native-pipeline batch's ``wsi`` aliases a slot ring that recycles the
    moment the iterator advances (data/native.py::NativePipeline.batches:
    pulling batch b+1 releases b's slot for refill). ``_grouped`` always has
    a one-batch lookahead and holds up to K batches before ``stack_batches``
    copies them, so grouped consumers must copy at pull time — the per-batch
    path instead closes the hazard inside ``_device_batch``."""
    for b in batches:
        if b.get("aliased"):
            b = dict(b)
            b["wsi"] = np.array(b["wsi"])
            del b["aliased"]
        yield b


def resolve_compute_dtype(
    value: str, backend: str, batch_size: int, data_axis: int
) -> str:
    """Resolve tpu.compute_dtype "auto": bf16 activations on TPU when the
    per-DEVICE batch (global batch / data_axis) is >= 128 — the measured
    crossover where the cast overhead amortizes (+14% at B=256, -12% at
    B=32 on v5e); f32 everywhere else. Heads stay f32 inside the models
    regardless of this choice."""
    if value != "auto":
        return value
    per_device = batch_size // max(1, data_axis)
    return "bfloat16" if backend == "tpu" and per_device >= 128 else "float32"


def _is_ge(model_name: str) -> bool:
    key = model_name.lower().replace("-", "_").replace(" ", "")
    return "ge" in key.split("_") or key.startswith("geneexpr") or key.startswith("ge_")


class Trainer:
    def __init__(self, config: Config, verbose: bool = True, split_rows=None):
        """``split_rows``: optional (train_rows, val_rows) row-index arrays
        overriding the config's seeded train/val split — the cross-validation
        driver (train/cv.py) feeds patient-level folds through this."""
        self.config = config
        self.verbose = verbose
        c = config

        # "auto" feed dtypes resolve per backend: bf16 on TPU (the MXU
        # consumes bf16 operands under default matmul precision anyway, so
        # f32 feeding only buys a giant on-device convert — profiled ~19% of
        # a B=256 step), f32 elsewhere (CPU tests keep exact f32 equality).
        def _feed_dtype(name: str) -> str:
            if name == "auto":
                return "bfloat16" if jax.default_backend() == "tpu" else "float32"
            return name

        self.transfer_dtype = _feed_dtype(c.tpu.transfer_dtype)
        self.cache_dtype = _feed_dtype(c.tpu.cache_dtype)

        self.ge_mode = _is_ge(c.model.name)
        if self.ge_mode and c.training.loss != "ce":
            # faithful to the GE driver's restriction (ge_nacagat/main.py:32-35)
            raise RuntimeError(f'Loss "{c.training.loss}" not implemented')
        self.leave_one_out = c.training.leave_one_out is not None

        if c.tpu.matmul_precision and c.tpu.matmul_precision != "default":
            jax.config.update("jax_default_matmul_precision", c.tpu.matmul_precision)
        if c.tpu.prng_impl:
            jax.config.update("jax_default_prng_impl", c.tpu.prng_impl)
        if c.tpu.compilation_cache_dir:
            # persistent XLA compile cache: repeated runs (resume, sweeps,
            # serving restarts) skip the multi-minute first-step compile
            set_compilation_cache_dir(c.tpu.compilation_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        # ----- dataset + splits (mcat/main.py:239-252) ---------------------
        if self.ge_mode:
            self.dataset = GeneExprDataset(
                c.dataset.file, c, gene=c.model.gene, verbose=verbose
            )
            self.extras_fn = gene_expr_extras
            self.omic_sizes: List[int] = []
        else:
            self.dataset = MultimodalDataset(
                c.dataset.file, c, use_signatures=True, verbose=verbose
            )
            self.extras_fn = survival_extras
            self.omic_sizes = self.dataset.signature_sizes
        if split_rows is not None:
            if self.leave_one_out:
                raise ValueError(
                    "split_rows and training.leave_one_out are mutually "
                    "exclusive — leave-one-out defines its own split"
                )
            tr_rows, va_rows = (np.asarray(r) for r in split_rows)
            # --bug-compat must reach the subsets here too (the normal path
            # passes it through table.split), or a CV A/B run would mix
            # bug-compat model behavior with fixed data alignment
            mis_kw = "misalign_labels" if self.ge_mode else "misalign_signatures"
            subset_kw = {mis_kw: c.training.bug_compat}
            self.train_ds = self.dataset._with_table(
                self.dataset.table.subset(tr_rows, **subset_kw)
            )
            self.val_ds = self.dataset._with_table(
                self.dataset.table.subset(va_rows, **subset_kw)
            )
            self.test_ds = None
            if verbose:
                print(
                    f"Using caller-provided split: {len(tr_rows)} train rows, "
                    f"{len(va_rows)} validation rows"
                )
        else:
            if verbose:
                ts = int(c.training.train_size * 100)
                print(f"Using {ts}% train, {100 - ts}% validation")
            self.train_ds, self.val_ds, self.test_ds = self.dataset.split(
                c.training.train_size,
                test=self.leave_one_out,
                patient=c.training.leave_one_out or "",
                seed=c.training.seed,
                bug_compat=c.training.bug_compat,
            )
        if verbose:
            print(
                f"Samples in train: {len(self.train_ds)}, "
                f"Samples in validation: {len(self.val_ds)}"
            )
            if self.test_ds is not None:
                print(f"Testing patient {c.training.leave_one_out}")

        # resolved once; every batcher (train/val/test/predict) must use this,
        # not the raw config value — an empty tpu.bag_buckets otherwise trains
        # fine but crashes in bucket_for at test/predict time
        self.buckets = tuple(c.tpu.bag_buckets) or DEFAULT_BUCKETS
        self.batch_size = c.tpu.batch_size or c.training.grad_acc_step
        self.train_batcher = BucketBatcher(
            self.train_ds, self.extras_fn, self.batch_size, self.buckets,
            shuffle=True, seed=c.training.seed,
        )
        self.val_batcher = BucketBatcher(
            self.val_ds, self.extras_fn, self.batch_size, self.buckets, shuffle=False
        )
        # the Trainer's _device_batch closes the pipeline's slot-aliasing
        # hazard, so the C++ pipelined executor is safe to engage here — but
        # its worker/consumer overlap needs host parallelism: on a single-CPU
        # host the thread ping-pong through the slot ring STALLS (measured
        # multi-second hiccups), so require >= 2 cores.
        pipeline_ok = c.tpu.use_native_pipeline and (os.cpu_count() or 1) >= 2
        self.train_batcher.use_native_pipeline = pipeline_ok
        self.val_batcher.use_native_pipeline = pipeline_ok

        # multi-host: every host computes the same seed-deterministic epoch
        # plan and feeds only its contiguous slice of each batch; the global
        # device arrays are assembled process-locally (parallel/mesh.py).
        # Metrics are process-allgathered (see _host_gather).
        self.n_processes = jax.process_count()
        if self.n_processes > 1:
            hs = (jax.process_index(), self.n_processes)
            self.train_batcher.host_slice = hs
            self.val_batcher.host_slice = hs

        # ----- NaN debugging (training.debug_nans) ---------------------------
        # jax_debug_nans re-runs the offending dispatch op-by-op when any jit
        # output is non-finite and raises at the exact primitive. Opt-in (it
        # synchronizes every dispatch); the always-on epoch-granularity guard
        # is the host-side loss finiteness check in _train_epoch.
        if c.training.debug_nans:
            jax.config.update("jax_debug_nans", True)
            if verbose:
                print("debug_nans: jax_debug_nans enabled (per-op NaN localization)")

        # ----- backend report ------------------------------------------------
        # The reference prints its CUDA device names (mcat/main.py:228-237).
        # The TPU-native equivalent matters MORE here: on a held/contended
        # single-tenant TPU, jax's backend init can fail and silently fall
        # back to CPU — a run the user believes is on-chip then trains orders
        # of magnitude slower. Report the resolved backend and warn loudly on
        # the accelerator-requested-but-CPU-resolved mismatch.
        backend = jax.default_backend()
        if verbose:
            kinds = {d.device_kind for d in jax.devices()}
            print(f"jax backend: {backend} ({', '.join(sorted(kinds))} "
                  f"x {jax.device_count()})")
        if c.device in ("tpu", "cuda", "gpu") and backend == "cpu":
            print(
                f"WARNING: config requests device '{c.device}' but jax "
                "initialized the CPU backend (accelerator unavailable or held "
                "by another process) — training will run on CPU",
                file=sys.stderr,
            )

        # ----- mesh scale-out (parallel/mesh.py) ----------------------------
        self.mesh = None
        if c.tpu.data_axis > 1 or c.tpu.seq_axis > 1:
            from multimodal_path_omic_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(data=c.tpu.data_axis, seq=c.tpu.seq_axis)
            if self.batch_size % c.tpu.data_axis != 0:
                # batches shard their row axis over the data axis
                # (parallel/mesh.py::batch_spec); an indivisible batch fails
                # deep inside device_put — make it a config error instead
                raise ValueError(
                    f"tpu.batch_size={self.batch_size} must be divisible by "
                    f"tpu.data_axis={c.tpu.data_axis} (batch rows shard over "
                    "the data axis)"
                )
            if verbose:
                print(
                    f"Mesh: data={c.tpu.data_axis} x seq={c.tpu.seq_axis} "
                    f"over {c.tpu.data_axis * c.tpu.seq_axis} devices"
                )
        elif self.n_processes > 1:
            # without a cross-process mesh there is no gradient sync: each
            # process would silently train a divergent replica on its data
            # slice. Make the misconfiguration loud instead.
            raise ValueError(
                f"{self.n_processes} jax processes but tpu.data_axis="
                f"{c.tpu.data_axis} x tpu.seq_axis={c.tpu.seq_axis} defines "
                "no mesh — set the axes to span all devices (e.g. data_axis="
                f"{jax.device_count()}) so gradients synchronize"
            )

        # ----- model (mcat/main.py:254-259) --------------------------------
        compute_dtype = resolve_compute_dtype(
            c.tpu.compute_dtype, jax.default_backend(),
            self.batch_size, c.tpu.data_axis,
        )
        self.compute_dtype = compute_dtype
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        # The mesh reaches the model for two distinct compositions
        # (ops/attention.py dispatch): with a seq axis > 1, bags shard over
        # it — GE self-attention rotates K/V around the ring, survival
        # co-attention merges shard-local softmax stats (parallel/ring.py);
        # with a data-only mesh, the fused Pallas kernels run per-shard via
        # shard_map (coattn.py::fused_attention_sharded).
        ring_mesh = self.mesh
        self.model = build_model(
            c.model.name,
            omic_sizes=self.omic_sizes,
            model_size=c.model.model_size,
            fusion=c.model.fusion,
            n_classes=c.model.n_classes if not self.ge_mode else 3,
            dropout=c.model.dropout,
            dtype=dtype,
            # On a multi-device mesh the fused kernels engage only through
            # their shard_map composition (no GSPMD rule for pallas_call —
            # ops/attention.py gates the direct calls to mesh_size == 1 and
            # routes data-parallel meshes to fused_attention_sharded).
            use_pallas=c.tpu.use_pallas,
            ring_mesh=ring_mesh,
            bug_compat=c.training.bug_compat,
        )
        rng = jax.random.key(c.training.seed)
        rng, init_rng = jax.random.split(rng)
        example = self._example_inputs()
        # jit the init: eager tracing of hundreds of param initializers is
        # slow; compiled init lands in the persistent compilation cache
        init_fn = jax.jit(lambda r: self.model.init(r, *example, deterministic=True))
        variables = init_fn(init_rng)
        self.n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables)
        )
        if verbose:
            print(f"Trainable parameters of {c.model.name}: {self.n_params}")

        # ----- optimizer / loss / scheduler (mcat/main.py:270-307) ---------
        self.optimizer = make_optimizer(
            c.training.optimizer, c.training.lr, c.training.weight_decay,
            grad_clip=c.training.grad_clip,
        )
        if verbose:
            print(f"Using optimizer: {c.training.optimizer}")
            print(f'Using loss "{c.training.loss}" during training')
        opt_state = self.optimizer.init(variables["params"])
        self.state = TrainState(
            params=variables["params"],
            opt_state=opt_state,
            rng=rng,
            step=jnp.zeros((), jnp.int32),
        )
        self.starting_epoch = 0
        # commit the fresh state to its canonical placement: checkpoint
        # restores hand back COMMITTED arrays (orbax), and jax lowers key
        # inputs differently by commitment — unifying placement here keeps
        # fresh and resumed runs byte-identical programs (see _place_state)
        self.state = self._place_state(self.state)

        # checkpoint restore (mcat/main.py:261-266, 309-312)
        if c.model.load_from_checkpoint:
            self.restore(c.model.load_from_checkpoint)

        self.train_step = make_train_step(
            self.model,
            c.training.loss,
            self.optimizer,
            alpha=c.training.alpha,
            l1_lambda=c.training.lambda_,
            ge_mode=self.ge_mode,
            omic_sizes=tuple(self.omic_sizes),
            donate_state=True,  # Trainer steps form a linear state chain
            patch_dropout=c.training.patch_dropout,
            remat=c.tpu.remat,
            int8_matmul=c.tpu.int8_matmul,
        )
        self.eval_step = make_eval_step(
            self.model, c.training.loss, alpha=c.training.alpha,
            ge_mode=self.ge_mode, omic_sizes=tuple(self.omic_sizes),
            l1_lambda=c.training.lambda_,
        )
        # multi-step dispatch: K optimizer steps per device call (exact
        # single-step semantics; amortizes dispatch RTT). Mesh runs compose
        # (stacked batches keep a leading unsharded [K] axis, parallel/
        # mesh.py::batch_spec), and so do multi-HOST runs: cached-feed metas
        # are global replicated arrays, host-fed stacks assemble from each
        # process's [K, local_B] slice (_host_k_cap). 0 = auto.
        spd = c.tpu.steps_per_dispatch
        self._spd_auto = spd <= 0
        if spd <= 0:
            # auto: measured 1.5-2x over K=1 on tunneled backends at K=8
            # (round 2), +34% at K=32 (round 3: 41.9k -> 56.0k bags/sec).
            # Round 4 re-tune: lean co-attention cut per-step device time
            # ~40%, making the step MORE dispatch-bound — K=64 now wins
            # (64.5k @ K=32 -> 72.3k bags/sec on the headline bench; K=128
            # only +2.4% more on 4.2 GB staging, rejected). Host-fed paths
            # stay byte-capped by _host_k_cap (K<=16 at the 512 bucket).
            spd = 64
        self.steps_per_dispatch = max(1, spd)
        self.multi_step = (
            make_multi_train_step(
                self.model,
                c.training.loss,
                self.optimizer,
                alpha=c.training.alpha,
                l1_lambda=c.training.lambda_,
                ge_mode=self.ge_mode,
                omic_sizes=tuple(self.omic_sizes),
                donate_state=True,
                patch_dropout=c.training.patch_dropout,
                remat=c.tpu.remat,
                int8_matmul=c.tpu.int8_matmul,
            )
            if self.steps_per_dispatch > 1
            else None
        )
        # grouped validation dispatch (no state carry — exactly K evals/call)
        self.multi_eval = (
            make_multi_eval_step(
                self.model, c.training.loss, alpha=c.training.alpha,
                ge_mode=self.ge_mode, omic_sizes=tuple(self.omic_sizes),
                l1_lambda=c.training.lambda_,
            )
            if self.steps_per_dispatch > 1
            else None
        )

        # device-resident dataset cache: bags uploaded once, batches gathered
        # on device (data/device_cache.py). Engaged lazily on first epoch.
        # Mesh runs compose (the cache shards its patch axis over every mesh
        # device — scale-out IS the fast path). Multi-host runs compose too:
        # every process reads the shared cohort and contributes its
        # addressable shards of the global cache arrays (mesh.py::put_global);
        # only PARTIAL caching falls back to host feeding there (the mixed
        # feed's host share would need per-process batch slicing).
        self.device_cache = None
        self.device_cache_val = None
        self._cached_eval = None
        self._cached_eval_multi = None
        self._cached_steps = None
        self._want_device_cache = c.tpu.device_cache in ("auto", "on")
        self._device_cache_forced = c.tpu.device_cache == "on"
        # partial caching: buckets that fit the budget are device-cached, the
        # rest host-feed (None = all cached buckets; set in _ensure_device_cache)
        self._cache_partial = False

        # per-Trainer packed-fetch jit signatures (see _bulk_fetch)
        self._pack_sigs: set = set()

        self.logger = MetricLogger(
            wandb_enabled=c.wandb.enabled,
            wandb_project=c.wandb.project,
            wandb_config=self._wandb_config(),
            jsonl_path=os.path.join(c.training.test_output_dir, "run_log.jsonl")
            if c.training.test_output_dir
            else None,
        )
        self.timer = StepTimer()

    # ------------------------------------------------------------------ util
    def _ensure_device_cache(self) -> bool:
        """Build the device-resident dataset cache on first use. Returns
        engagement. When the full padded cohort exceeds the budget, the
        bucket subset that fits is cached (cheapest-bytes-per-bag first) and
        the overflow buckets host-feed — partial caching instead of an
        all-or-nothing throughput cliff at budget+1 byte. On a mesh, the
        budget is per-DEVICE bytes (the cache shards over all mesh devices).
        """
        if not self._want_device_cache:
            return False
        if self.device_cache is not None:
            return True
        if len(self.train_ds) == 0:
            self._want_device_cache = False
            return False
        from multimodal_path_omic_tpu.data.device_cache import DeviceBagCache
        from multimodal_path_omic_tpu.train.loop import make_cached_train_step

        c = self.config
        lengths = self.train_batcher._bag_lengths()
        val_lengths = (
            self.val_batcher._bag_lengths() if len(self.val_ds) else np.zeros(0)
        )
        all_lengths = np.concatenate([lengths, val_lengths])
        dim = int(self.train_ds.bag(0).shape[1])
        cache_dtype = self.cache_dtype
        n_mesh = 1 if self.mesh is None else int(np.prod(list(self.mesh.shape.values())))
        budget = c.tpu.device_cache_budget_bytes * n_mesh  # per-device budget
        per_bucket = DeviceBagCache.bucket_bytes(
            all_lengths, self.buckets, dim, store_dtype=cache_dtype
        )
        # the budget-fit policy is shared with the AOT planner (train/plan.py)
        # so `cli plan` predictions cannot drift from what actually happens
        from multimodal_path_omic_tpu.data.bags import bucket_for
        from multimodal_path_omic_tpu.data.device_cache import plan_cache_fit

        counts: Dict[int, int] = {}
        for m in all_lengths:
            b = bucket_for(int(m), self.buckets)
            counts[b] = counts.get(b, 0) + 1
        only_buckets, nbytes, engaged = plan_cache_fit(
            per_bucket, counts, budget,
            forced=self._device_cache_forced,
            multi_host=self.n_processes > 1,
        )
        if not engaged:
            if self.verbose:
                total = sum(per_bucket.values())
                note = (
                    "multi-host runs do not partial-cache"
                    if self.n_processes > 1
                    else "no bucket fits"
                )
                print(
                    f"Device dataset cache: cohort ({total / (1 << 20):.0f} "
                    f"MiB) exceeds the budget ({budget / (1 << 20):.0f} MiB) "
                    f"— {note}; host feeding"
                )
            self._want_device_cache = False
            return False
        if only_buckets is not None:
            self._cache_partial = True
        if self.verbose:
            scope = (
                f"buckets {sorted(only_buckets)} (partial; others host-feed)"
                if only_buckets is not None
                else f"{len(self.train_ds)} train + {len(self.val_ds)} val bags"
            )
            shard_note = f", sharded over {n_mesh} devices" if n_mesh > 1 else ""
            print(
                f"Device dataset cache: {nbytes / (1 << 20):.0f} MiB of padded "
                f"bags ({cache_dtype}) uploaded once ({scope}{shard_note})"
            )
        self.device_cache = DeviceBagCache(
            self.train_ds, self.extras_fn, self.buckets,
            ge_mode=self.ge_mode, lengths=lengths, store_dtype=cache_dtype,
            mesh=self.mesh, only_buckets=only_buckets,
        )
        self.device_cache_val = (
            DeviceBagCache(
                self.val_ds, self.extras_fn, self.buckets,
                ge_mode=self.ge_mode, lengths=val_lengths,
                store_dtype=cache_dtype, mesh=self.mesh,
                only_buckets=only_buckets,
            )
            if len(self.val_ds)
            else None
        )
        self._cached_eval = make_eval_step(
            self.model, c.training.loss, alpha=c.training.alpha,
            ge_mode=self.ge_mode, omic_sizes=tuple(self.omic_sizes),
            l1_lambda=c.training.lambda_, cached=True, mesh=self.mesh,
        )
        self._cached_eval_multi = (
            make_multi_eval_step(
                self.model, c.training.loss, alpha=c.training.alpha,
                ge_mode=self.ge_mode, omic_sizes=tuple(self.omic_sizes),
                l1_lambda=c.training.lambda_, cached=True, mesh=self.mesh,
            )
            if self.steps_per_dispatch > 1
            else None
        )
        kwargs = dict(
            alpha=c.training.alpha,
            l1_lambda=c.training.lambda_,
            ge_mode=self.ge_mode,
            omic_sizes=tuple(self.omic_sizes),
            donate_state=True,
            patch_dropout=c.training.patch_dropout,
            mesh=self.mesh,
            remat=c.tpu.remat,
            int8_matmul=c.tpu.int8_matmul,
        )
        self._cached_steps = (
            make_cached_train_step(
                self.model, c.training.loss, self.optimizer, multi=False, **kwargs
            ),
            make_cached_train_step(
                self.model, c.training.loss, self.optimizer, multi=True, **kwargs
            )
            if self.steps_per_dispatch > 1
            else None,
        )
        return True

    def _put_meta(self, meta):
        """Pin gather metas to the mesh (replicated): tiny arrays, but jit
        placement of uncommitted numpy next to mesh-sharded operands must not
        be left to inference. Multi-host: every process computes the same
        seed-deterministic meta, so the replicated global array assembles
        from identical per-process copies (put_global). No-op off-mesh (numpy
        commits to the default device)."""
        if self.mesh is None:
            return meta
        from jax.sharding import NamedSharding, PartitionSpec as P

        from multimodal_path_omic_tpu.parallel.mesh import put_global

        sh = NamedSharding(self.mesh, P())
        return {k: put_global(v, sh) for k, v in meta.items()}

    def _slice_host(self, x: np.ndarray) -> np.ndarray:
        """This process's contiguous slice of a per-batch host array — the
        same slicing BucketBatcher.host_slice applies to host-fed labels, so
        cached-feed metric arrays concatenate back to global batch order under
        _host_gather's process allgather. No-op single-process."""
        if self.n_processes == 1:
            return x
        per = len(x) // self.n_processes
        pid = jax.process_index()
        return x[pid * per : (pid + 1) * per]

    def _batch_info(self, meta, real: int, table, ge_labels=None) -> Dict:
        """Per-batch metric dict for a CACHED-feed batch. Arrays carry THIS
        process's slice (multi-host), matching the host-fed label contract
        _host_gather's allgather reassembles to global batch order.
        ``ge_labels``: the GE-mode label array to slice instead of survival
        labels (eval only — train GE metrics need no labels)."""
        info = {"n_real": real, "weight": self._slice_host(meta["weight"])}
        if table is not None:
            info["censorship"] = self._slice_host(table.censorship[meta["row"]])
            info["survival_months"] = self._slice_host(
                table.survival_months[meta["row"]]
            )
        elif ge_labels is not None:
            info["label"] = self._slice_host(ge_labels[meta["row"]])
        return info

    def _bulk_fetch_begin(self, tree):
        """ENQUEUE the packed D2H round for ``tree`` and return a handle for
        ``_bulk_fetch_end``. Split from ``_bulk_fetch`` so the epoch pipeline
        can start the transfer (device work + async copies) BEFORE dispatching
        the next chain of device calls (validation / the next epoch): on an
        in-order device the pack computation enqueued here runs right after
        the train steps, while work enqueued later executes behind it."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        pack = [
            i
            for i, x in enumerate(leaves)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32
        ]
        # order-invariant jit signature: sort by shape so epoch-to-epoch
        # variation in dispatch-group ORDER does not retrace
        pack.sort(key=lambda i: leaves[i].shape)
        sig = tuple(leaves[i].shape for i in pack)
        sigs = self._pack_sigs
        packed = None
        if len(pack) > 1 and (sig in sigs or len(sigs) < _PACK_SIG_CAP):
            sigs.add(sig)
            packed = _pack_leaves(*[leaves[i] for i in pack])
            packed.copy_to_host_async()
        else:
            pack = []
        for i, x in enumerate(leaves):
            if i not in pack and isinstance(x, jax.Array):
                x.copy_to_host_async()
        return leaves, treedef, pack, packed

    def _bulk_fetch_end(self, handle):
        """Materialize a ``_bulk_fetch_begin`` handle on the host."""
        leaves, treedef, pack, packed = handle
        if packed is not None:
            flat = np.asarray(packed)
            off = 0
            for i in pack:
                n = int(np.prod(leaves[i].shape))
                leaves[i] = flat[off : off + n].reshape(leaves[i].shape)
                off += n
        leaves = [np.asarray(x) if isinstance(x, jax.Array) else x for x in leaves]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _bulk_fetch(self, tree):
        """Fetch a pytree of device arrays with ONE device transfer.

        ``jax.device_get`` pulls leaves serially, paying a full dispatch RTT
        per leaf on remote/tunneled backends (profiled: 39 epoch metric leaves
        x ~6 ms = 0.24 s of a 0.30 s epoch; even pipelined async copies cost
        ~2.5 ms/leaf here). All f32 leaves are packed into one flat device
        array by a single jitted concat and fetched together; any remaining
        leaves fall back to pipelined async copies. The signature cap is
        per-Trainer (not process-global) so config sweeps creating several
        trainers in one process keep the packed path for each."""
        return self._bulk_fetch_end(self._bulk_fetch_begin(tree))

    def _host_k_cap(self, K):
        """Per-bucket dispatch-group size cap for HOST-FED stacked batches:
        K=8 at a 24576 bucket would stack a multi-GB host+device buffer, so
        large buckets fall back toward single steps. Auto mode only — an
        explicit steps_per_dispatch is honored as configured. Multi-host
        included: each process stacks its [K, local_B] slice and the global
        [K, B] batch assembles from per-process shards (probe-verified
        make_array_from_process_local_data semantics; equality-pinned in
        tests/test_multihost.py). The byte cap sizes the LOCAL slice.

        The cap is sized on the f32 HOST-staging bytes (4/elem), not the
        transfer dtype: stack_batches stages f32 on the host and quantization
        to bf16/int8 happens after stacking in _device_batch, so the host
        buffer dominates peak memory regardless of transfer_dtype."""

        def k_cap(b):
            if not self._spd_auto:
                return K
            # local (per-process) batch rows are what this host stages
            rows = self.batch_size // self.n_processes
            per = rows * int(b["bucket"]) * b["wsi"].shape[-1] * 4
            return max(1, min(K, _SPD_STACK_BYTES // max(per, 1)))

        return k_cap

    def _host_gather(self, x) -> np.ndarray:
        """Materialize an array on THIS host. Single-process: plain asarray.
        Multi-host: process_allgather (device arrays may have non-addressable
        shards; host arrays are per-process slices to concatenate)."""
        if self.n_processes > 1:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    def _example_inputs(self):
        m = 128
        wsi = jnp.zeros((1, m, 1024), jnp.float32)
        mask = jnp.ones((1, m), bool)
        if self.ge_mode:
            return (wsi, mask)
        omics = [jnp.zeros((1, s), jnp.float32) for s in self.omic_sizes]
        return (wsi, omics, mask)

    def _wandb_config(self) -> Dict[str, Any]:
        c = self.config
        # flattened hyperparams like wandb_init (mcat/main.py:186-215)
        return {
            "model": c.model.name,
            "dataset": c.dataset.name,
            "normalization": c.dataset.normalize,
            "standardization": c.dataset.standardize,
            "decider_only": c.dataset.decider_only,
            "tcga_only": c.dataset.tcga_only,
            "diagnostic_only": c.dataset.diagnostic_only,
            "optimizer": c.training.optimizer,
            "learning_rate": c.training.lr,
            "weight_decay": c.training.weight_decay,
            "gradient_acceleration_step": c.training.grad_acc_step,
            "epochs": c.training.epochs,
            "architecture": c.model.name,
            "fusion": c.model.fusion,
            "loss": c.training.loss,
            "scheduler": c.training.scheduler,
            "alpha": c.training.alpha,
            "lambda": c.training.lambda_,
            "gamma": c.training.gamma,
            "model_size": c.model.model_size,
            "leave_one_out": c.training.leave_one_out,
        }

    def _device_batch(self, batch, stacked: bool = False) -> Dict[str, Any]:
        """``stacked``: the batch carries a leading [K] dispatch-group axis
        (stack_batches); on a mesh it stays unsharded in every spec."""
        batch = dict(batch)
        # ``aliased``: wsi aliases a reusable native-pipeline slot buffer; the
        # hazard is closed below — copy on CPU (jax CPU arrays can zero-copy
        # host numpy memory), or block on the H2D transfer so the bytes are on
        # device before the slot can be recycled.
        aliased = bool(batch.pop("aliased", False))
        if self.transfer_dtype == "bfloat16":
            batch["wsi"] = np.asarray(batch["wsi"], np.float32).astype(jnp.bfloat16)
            aliased = False  # astype copied
        elif self.transfer_dtype == "int8":
            # quarter H2D bytes: per-patch symmetric int8 (data/quant.py); the
            # jitted steps dequantize on device (loop.py::_dequant_wsi)
            from multimodal_path_omic_tpu.data.quant import quantize_bag_int8

            batch["wsi"], batch["wsi_scale"] = quantize_bag_int8(batch["wsi"])
            aliased = False  # quantization copied
        elif aliased and jax.default_backend() == "cpu":
            batch["wsi"] = np.array(batch["wsi"])
            aliased = False
        if "omics" in batch:
            # one transfer instead of one per signature group
            batch["omics_packed"] = np.concatenate(
                [np.asarray(o) for o in batch.pop("omics")], axis=-1
            )
        if self.mesh is not None:
            from multimodal_path_omic_tpu.parallel.mesh import shard_batch

            out = shard_batch(
                {k: v for k, v in batch.items() if k not in ("bucket", "n_real", "index")},
                self.mesh,
                stacked=stacked,
            )
            if aliased:
                jax.block_until_ready(out["wsi"])
            return out
        out = {}
        for k, v in batch.items():
            if k in ("bucket", "n_real"):
                continue
            if k == "omics":
                out[k] = [jnp.asarray(o) for o in v]
            elif k == "index":
                out[k] = np.asarray(v)
            else:
                out[k] = jnp.asarray(v)
        if aliased:
            # guaranteed-copy transfer completion: the slot may be recycled
            # the moment the pipeline advances
            jax.block_until_ready(out["wsi"])
        return out

    # --------------------------------------------------------------- training
    def _cached_items(self, plan, cache, ds):
        """(bucket, meta, info) per batch of ``plan`` whose bucket is cached."""
        from multimodal_path_omic_tpu.data.device_cache import build_meta

        t = None if self.ge_mode else ds.table
        for indices, bucket in plan:
            meta, real = build_meta(indices, self.batch_size, cache)
            yield bucket, meta, self._batch_info(meta, real, t)

    def _staged_cached_train(self, K):
        """Dispatch groups over the fully-cached cohort: (infos, call)."""
        single_c, multi_c = self._cached_steps
        items = self._cached_items(
            self.train_batcher._epoch_plan(), self.device_cache, self.train_ds
        )
        for group in _grouped(items, key_fn=lambda x: x[0], K=K):
            cache = self.device_cache.caches[group[0][0]]
            infos = [g[2] for g in group]
            if len(group) == 1:
                meta = self._put_meta(group[0][1])
                yield infos, (lambda st, c=cache, m=meta: single_c(st, c, m))
            else:
                stacked = self._put_meta(
                    {k: np.stack([g[1][k] for g in group]) for k in group[0][1]}
                )
                yield infos, (lambda st, c=cache, m=stacked: multi_c(st, c, m))

    def _staged_mixed_train(self, K):
        """Partial-cache dispatch groups: cached buckets run the device-gather
        step, overflow buckets stage host batches (BucketBatcher._make_batch;
        the native pipelined executor needs a whole-epoch plan, so the host
        share of a mixed epoch takes the plain per-batch loader)."""
        from multimodal_path_omic_tpu.data.device_cache import build_meta

        single_c, multi_c = self._cached_steps
        t = None if self.ge_mode else self.train_ds.table
        cached_buckets = set(self.device_cache.caches)
        k_cap = self._host_k_cap(K)

        def _items():
            for indices, bucket in self.train_batcher._epoch_plan():
                yield (bucket in cached_buckets, bucket), indices, bucket

        # the byte cap expects a batch-like dict with bucket + wsi dim; the
        # dim is cohort-constant — probe it once, not per host-fed group
        dim = int(self.train_ds.bag(0).shape[1])

        def _k_fn(item):
            (is_cached, _), indices, bucket = item
            if is_cached:
                return K
            return k_cap({"bucket": bucket, "wsi": np.empty((0, 0, dim))})

        for group in _grouped(_items(), key_fn=lambda x: x[0], K=K, k_fn=_k_fn):
            (is_cached, bucket) = group[0][0]
            if is_cached:
                cache = self.device_cache.caches[bucket]
                metas, infos = [], []
                for _, indices, _b in group:
                    meta, real = build_meta(indices, self.batch_size, self.device_cache)
                    metas.append(meta)
                    infos.append(self._batch_info(meta, real, t))
                if len(group) == 1:
                    meta = self._put_meta(metas[0])
                    yield infos, (lambda st, c=cache, m=meta: single_c(st, c, m))
                else:
                    stacked = self._put_meta(
                        {k: np.stack([m[k] for m in metas]) for k in metas[0]}
                    )
                    yield infos, (lambda st, c=cache, m=stacked: multi_c(st, c, m))
            else:
                batches = [
                    self.train_batcher._make_batch(indices, b)
                    for _, indices, b in group
                ]
                if len(batches) == 1:
                    dev = self._device_batch(batches[0])
                    yield batches, (lambda st, d=dev: self.train_step(st, d))
                else:
                    dev = self._device_batch(stack_batches(batches), stacked=True)
                    yield batches, (lambda st, d=dev: self.multi_step(st, d))

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        return self._train_epoch_reduce(epoch, self._train_epoch_dispatch(epoch))

    def _train_epoch_dispatch(self, epoch: int) -> Dict[str, Any]:
        """Run the DEVICE side of a training epoch: enqueue every train-step
        dispatch (and the stats that are pure host bookkeeping) and return a
        context for ``_train_epoch_reduce``. Metrics stay on device. Split so
        ``validated_epoch`` can enqueue validation eval steps behind the train
        chain before the host blocks on the epoch's packed metric fetch."""
        c = self.config
        # Epoch-indexed LR schedules (cosine/step/warmup) set the lr
        # ABSOLUTELY at epoch start — resume lands on exactly the lr a
        # straight-through run would use. The reference's exp scheduler keeps
        # its original end-of-epoch multiplicative step below (identical
        # values; preserved verbatim for the pinned parity tests) unless
        # warmup is active, in which case the absolute form subsumes it.
        if c.training.scheduler in ("cosine", "step") or c.training.warmup_epochs:
            self.state = self.state._replace(
                opt_state=set_lr(
                    self.state.opt_state,
                    schedule_lr(
                        c.training.scheduler,
                        c.training.lr,
                        epoch,
                        gamma=c.training.gamma,
                        total_epochs=c.training.epochs,
                        warmup_epochs=c.training.warmup_epochs,
                        min_lr=c.training.min_lr,
                        step_size=c.training.step_size,
                    ),
                )
            )
        # Metric scalars stay ON DEVICE during the epoch: reading them per
        # step would block the dispatch pipeline (device idles while the host
        # formats floats). Everything is pulled once at epoch end.
        losses, attn_losses, step_reals = [], [], []
        risks, weights, censorships, months = [], [], [], []
        n_steps = 0
        self.timer.reset()
        epoch_t0 = time.time()
        # the prefetch thread also issues the host->device transfer, so H2D
        # overlaps the previous step's compute. With steps_per_dispatch > 1,
        # K consecutive same-bucket batches are stacked into ONE transfer and
        # ONE device call running K optimizer steps (exact same semantics).
        # With the device cache engaged, bags never cross the host boundary:
        # only per-batch index metas are transferred.
        K = self.steps_per_dispatch

        engaged = self._ensure_device_cache()
        if engaged and not self._cache_partial:
            feed = prefetch(self._staged_cached_train(K), depth=c.tpu.prefetch)
        elif engaged:
            # partial cache: cached buckets gather on device, overflow
            # buckets host-feed — intermediate throughput instead of the
            # all-or-nothing cliff at budget+1 byte
            feed = prefetch(self._staged_mixed_train(K), depth=c.tpu.prefetch)
        else:

            def _staged_host(batches):
                if K == 1:
                    for b in batches:
                        dev = self._device_batch(b)
                        yield [b], (lambda st, d=dev: self.train_step(st, d))
                    return
                for group in _grouped(
                    _own_aliased(batches), key_fn=lambda b: b["bucket"], K=K,
                    k_fn=self._host_k_cap(K),
                ):
                    if len(group) == 1:
                        dev = self._device_batch(group[0])
                        yield group, (lambda st, d=dev: self.train_step(st, d))
                    else:
                        dev = self._device_batch(stack_batches(group), stacked=True)
                        yield group, (lambda st, d=dev: self.multi_step(st, d))

            feed = prefetch(
                _staged_host(self.train_batcher.batches()), depth=c.tpu.prefetch
            )

        # metrics stay ON DEVICE in their dispatch-group shape (scalar leaves
        # for single steps, [K]-stacked for multi-step groups) — slicing them
        # per step here would issue an eager device op (and RTT) per slice
        group_metrics: List = []  # (StepMetrics, group size)
        for group, call in feed:
            self.state, m = call(self.state)
            k = len(group)
            group_metrics.append((m, k))
            for batch in group:
                real = int(batch["n_real"])  # global real count (multi-host safe)
                step_reals.append(real)
                n_steps += 1
                self.timer.tick(real)
                if not self.ge_mode:
                    # collect full per-step arrays; weight-0 pad rows are
                    # dropped at epoch end (multi-host: each host holds its
                    # batch slice of the labels, gathered in _host_gather)
                    weights.append(batch["weight"])
                    censorships.append(batch["censorship"])
                    months.append(batch["survival_months"])
            if self.verbose and (n_steps // 50) > ((n_steps - k) // 50):
                # periodic progress print (syncs; mirrors the reference's
                # per-50-batch print, mcat/main.py:63-68, divisor fixed)
                sps, bps = self.timer.rates()
                last = m.loss if k == 1 else m.loss[-1]
                print(
                    f"\tstep: {n_steps}, loss: {float(last):.4f}, "
                    f"bags/s: {bps:.2f}"
                )
        return {
            "losses": losses, "attn_losses": attn_losses,
            "step_reals": step_reals, "risks": risks, "weights": weights,
            "censorships": censorships, "months": months, "n_steps": n_steps,
            "epoch_t0": epoch_t0, "group_metrics": group_metrics,
            "fetch_handle": None,
        }

    def _begin_metric_fetch(self, ctx: Dict[str, Any]) -> None:
        """Enqueue the packed D2H round for a dispatch context's on-device
        metrics (idempotent). Call between ``_train_epoch_dispatch`` and any
        further device dispatches so the fetch rides ahead of them."""
        if ctx["fetch_handle"] is None and self.n_processes == 1:
            ctx["fetch_handle"] = self._bulk_fetch_begin(ctx["group_metrics"])

    def _train_epoch_reduce(self, epoch: int, ctx: Dict[str, Any]) -> Dict[str, float]:
        """HOST side of a training epoch: fetch the on-device metrics, compute
        the per-sample means + train c-index, step the exp scheduler, log."""
        c = self.config
        losses, attn_losses = ctx["losses"], ctx["attn_losses"]
        step_reals, risks = ctx["step_reals"], ctx["risks"]
        weights, censorships, months = (
            ctx["weights"], ctx["censorships"], ctx["months"]
        )
        n_steps, epoch_t0 = ctx["n_steps"], ctx["epoch_t0"]
        group_metrics = ctx["group_metrics"]
        # ONE pipelined D2H round for all epoch metrics (per-leaf pulls pay a
        # full RTT each on remote backends — profiled at ~6 ms/leaf) — unless
        # validated_epoch already fetched them in its combined round
        if not ctx.get("fetched"):
            self._begin_metric_fetch(ctx)
        if ctx["fetch_handle"] is not None:
            group_metrics = self._bulk_fetch_end(ctx["fetch_handle"])
        for m, k in group_metrics:
            # loss/attn_loss are replicated scalars (or [K] stacks): np.asarray
            # works on every backend incl. multi-host; risk is data-sharded and
            # needs the process allgather
            losses.extend(np.ravel(np.asarray(m.loss)).tolist())
            attn_losses.extend(np.ravel(np.asarray(m.attn_loss)).tolist())
            if not self.ge_mode:
                risks.append(np.asarray(self._host_gather(m.risk)).reshape(k, -1))
        loss_vals = np.array(losses) if losses else np.zeros(1)
        if not np.all(np.isfinite(loss_vals)):
            # failure detection: surface divergence with context instead of
            # silently training on NaNs
            bad = int(np.argmax(~np.isfinite(loss_vals)))
            raise FloatingPointError(
                f"non-finite loss {loss_vals[bad]} at epoch {epoch + 1} "
                f"step {bad + 1}"
            )
        # per-SAMPLE mean like the reference (mcat/main.py:61, 77), exact even
        # with weight-padded partial batches
        w = np.array(step_reals, float) if step_reals else np.ones(1)
        # exposed for tooling (cli profile normalizes trace time per step)
        self.last_epoch_steps = n_steps
        out: Dict[str, float] = {
            "train_loss": float((loss_vals * w).sum() / max(w.sum(), 1.0)),
            "epoch_seconds": time.time() - epoch_t0,
        }
        if self.ge_mode:
            # GE logs each loss under both *_loss and *_mse keys
            # (ge_nacagat/main.py:82)
            out["train_mse"] = out["train_loss"]
            msg = f"Epoch: {epoch + 1}, train_loss: {out['train_loss']:.4f}"
        else:
            if risks:
                # risks were host-gathered per group above; labels are host
                # slices needing the per-process allgather
                risks_all = np.concatenate([r.reshape(-1) for r in risks])
                w_all = np.concatenate([self._host_gather(w) for w in weights])
                cens_all = np.concatenate([self._host_gather(x) for x in censorships])
                months_all = np.concatenate([self._host_gather(x) for x in months])
                sel = w_all > 0
                risks_all, cens_all, months_all = (
                    risks_all[sel], cens_all[sel], months_all[sel]
                )
            else:
                risks_all = cens_all = months_all = np.zeros(0)
            try:
                c_index = concordance_index_censored(
                    (1 - cens_all).astype(bool), months_all, risks_all
                )[0]
            except ValueError:
                c_index = float("nan")
            out["train_c_index"] = c_index
            attn_vals = np.array([float(a) for a in attn_losses]) if attn_losses else np.zeros(1)
            out["train_attn_loss"] = float((attn_vals * w).sum() / max(w.sum(), 1.0))
            msg = (
                f"Epoch: {epoch + 1}, train_loss: {out['train_loss']:.4f}, "
                f"train_c_index: {c_index:.4f}"
            )
        if c.training.scheduler == "exp" and not c.training.warmup_epochs:
            lr = current_lr(self.state.opt_state)
            self.state = self.state._replace(
                opt_state=step_exponential(self.state.opt_state, c.training.gamma)
            )
            msg = f"{msg}, lr: {lr:.8f}"
        elif c.training.scheduler in ("cosine", "step") or c.training.warmup_epochs:
            msg = f"{msg}, lr: {current_lr(self.state.opt_state):.8f}"
        if self.verbose:
            print(msg)

        # periodic checkpoint (mcat/main.py:88-100)
        ce = c.model.checkpoint_epoch
        if ce and ce > 0 and (epoch + 1) % ce == 0 and epoch != 0:
            path = self.save(epoch, out["train_loss"])
            if self.verbose:
                print(f"Saving model into {path}")
        self.logger.log(
            {k: v for k, v in out.items() if not math.isnan(v)}, step=epoch
        )
        return out

    def _val_results(self):
        """Yield (infos, eval result) — ``infos`` is the list of per-batch
        label/weight dicts in a dispatch group; result leaves carry a leading
        [k] axis when the group ran as ONE device call (multi-eval dispatch).
        Device-cached when the cache is engaged (no per-epoch bag re-upload),
        host-fed otherwise."""
        K = self.steps_per_dispatch
        if self._ensure_device_cache() and self.device_cache_val is not None:
            from multimodal_path_omic_tpu.data.device_cache import build_meta

            t = None if self.ge_mode else self.val_ds.table
            cached_buckets = set(self.device_cache_val.caches)

            def _items():
                for indices, bucket in self.val_batcher._epoch_plan():
                    if bucket not in cached_buckets:
                        # partial cache: overflow buckets host-feed
                        yield (False, bucket), indices, None
                        continue
                    meta, real = build_meta(
                        indices, self.batch_size, self.device_cache_val
                    )
                    info = self._batch_info(
                        meta, real, t,
                        ge_labels=(
                            self.val_ds.table.gene_expr_class if t is None else None
                        ),
                    )
                    yield (True, bucket), meta, info

            for group in _grouped(_items(), key_fn=lambda x: x[0], K=K):
                (is_cached, bucket) = group[0][0]
                if not is_cached:
                    for _, indices, _info in group:
                        batch = self.val_batcher._make_batch(indices, bucket)
                        dev = self._device_batch(batch)
                        yield [batch], self.eval_step(self.state.params, dev)
                    continue
                cache = self.device_cache_val.caches[bucket]
                infos = [g[2] for g in group]
                if len(group) == 1:
                    yield infos, self._cached_eval(
                        self.state.params, cache, self._put_meta(group[0][1])
                    )
                else:
                    stacked = self._put_meta(
                        {k: np.stack([g[1][k] for g in group]) for k in group[0][1]}
                    )
                    yield infos, self._cached_eval_multi(
                        self.state.params, cache, stacked
                    )
            return
        if K == 1 or self.multi_eval is None:
            for batch in self.val_batcher.batches():
                dev = self._device_batch(batch)
                yield [batch], self.eval_step(self.state.params, dev)
            return
        for group in _grouped(
            _own_aliased(self.val_batcher.batches()),
            key_fn=lambda b: b["bucket"], K=K,
            k_fn=self._host_k_cap(K),
        ):
            if len(group) == 1:
                dev = self._device_batch(group[0])
                yield group, self.eval_step(self.state.params, dev)
            else:
                dev = self._device_batch(stack_batches(group), stacked=True)
                yield group, self.multi_eval(self.state.params, dev)

    def validate(self, epoch) -> Dict[str, float]:
        # the lazy generator interleaves eval dispatch with host accumulation,
        # exactly the pre-split behavior
        return self._validate_reduce(epoch, self._val_results())

    def validated_epoch(self, epoch: int) -> Tuple[Dict[str, float], Dict[str, float]]:
        """One train epoch + its validation as ONE overlapped dispatch chain.

        The serial form (``train_epoch`` then ``validate``) pays TWO host
        syncs per epoch — the train metric fetch, then the val result fetch —
        and on a remote/tunneled backend each sync is a full RTT that dwarfs
        the device work of a real-sized cohort's epoch. Here the order is:
        enqueue every train step, enqueue every eval step, then ONE combined
        packed D2H round for train metrics + val results, then both host
        reduces off the fetched arrays — the reference's serial epoch loop
        (mcat/main.py:74-76) has no analogue of this. Semantics are identical
        (equality-tested): eval consumes ``state.params`` which is final once
        the last train step is enqueued."""
        # Overridden train_epoch/validate (subclasses, test monkeypatches,
        # custom drivers) must keep observing their calls — only the default
        # implementations are safe to decompose into the overlapped chain.
        if (
            type(self).train_epoch is not _DEFAULT_TRAIN_EPOCH
            or type(self).validate is not _DEFAULT_VALIDATE
            or "train_epoch" in self.__dict__
            or "validate" in self.__dict__
        ):
            out = self.train_epoch(epoch)
            return out, self.validate(epoch)
        ctx = self._train_epoch_dispatch(epoch)
        val_groups = list(self._val_results())  # enqueues all eval dispatches
        if self.n_processes == 1:
            # ONE combined packed D2H round for train metrics AND val results:
            # every host sync on a remote/tunneled backend costs a full RTT
            # (measured 29 ms on the dev tunnel vs 1.4 ms pipelined dispatch),
            # and the two-fetch form pays it twice per epoch — at the
            # 512-patient cohort's ~6 ms of device work per epoch the second
            # sync IS the epoch boundary.
            gm, val_res = self._bulk_fetch(
                (ctx["group_metrics"], [res for _, res in val_groups])
            )
            ctx["group_metrics"] = gm
            ctx["fetched"] = True
            val_groups = [
                (infos, res) for (infos, _), res in zip(val_groups, val_res)
            ]
        train_out = self._train_epoch_reduce(epoch, ctx)
        val_out = self._validate_reduce(epoch, val_groups)
        return train_out, val_out

    def _validate_reduce(self, epoch, results) -> Dict[str, float]:
        risks, weights, censorships, months, losses, step_reals = [], [], [], [], [], []
        ys, ge_labels = [], []
        n_steps = 0
        for infos, res in results:
            # res leaves are per-batch, or [k]-stacked for multi-eval groups;
            # flattened AFTER the bulk fetch in the same batch order
            losses.append(res["loss"])
            if not self.ge_mode:
                risks.append(res["risk"])
            else:
                ys.append(res["y"])
            for info in infos:
                real = int(info["n_real"])
                step_reals.append(real)
                n_steps += 1
                if not self.ge_mode:
                    weights.append(info["weight"])
                    censorships.append(info["censorship"])
                    months.append(info["survival_months"])
                else:
                    ge_labels.append(info["label"])
                    weights.append(info["weight"])
        # per-sample mean (reference: mcat/main.py:147)
        if self.n_processes == 1:
            losses, risks, ys = self._bulk_fetch((losses, risks, ys))
        # flatten [k]-stacked group leaves back to batch order (loss is a
        # replicated scalar/stack on every backend; risk/y are data-sharded
        # and go through the per-process allgather below)
        losses = [np.ravel(np.asarray(l)) for l in losses]
        lv = np.concatenate(losses) if losses else np.zeros(1)
        wv = np.array(step_reals, float) if step_reals else np.ones(1)
        out = {"val_loss": float((lv * wv).sum() / max(wv.sum(), 1.0))}
        label = epoch if isinstance(epoch, str) else epoch + 1
        if self.ge_mode:
            # *_mse alias keys (ge_nacagat/main.py:119)
            out["val_mse"] = out["val_loss"]
            if ys:
                # extra observability over the reference (which logs only the
                # loss, ge_nacagat/main.py:119): weighted top-1 accuracy
                y_flat = []
                for y in ys:
                    arr = np.asarray(self._host_gather(y))
                    y_flat.append(arr.reshape(-1, arr.shape[-1]))
                y_all = np.concatenate(y_flat)
                l_all = np.concatenate([self._host_gather(x) for x in ge_labels])
                w_all = np.concatenate([self._host_gather(w) for w in weights])
                hit = (np.argmax(y_all, axis=1) == l_all).astype(float)
                out["val_accuracy"] = float(
                    (hit * w_all).sum() / max(w_all.sum(), 1.0)
                )
            msg = f"Epoch: {label}, val_loss: {out['val_loss']:.4f}"
        else:
            if risks:
                # [k,B]-stacked group leaves flatten back to batch order
                risks_all = np.concatenate(
                    [np.asarray(self._host_gather(r)).reshape(-1) for r in risks]
                )
                w_all = np.concatenate([self._host_gather(w) for w in weights])
                cens_all = np.concatenate([self._host_gather(x) for x in censorships])
                months_all = np.concatenate([self._host_gather(x) for x in months])
                sel = w_all > 0
                risks_all, cens_all, months_all = (
                    risks_all[sel], cens_all[sel], months_all[sel]
                )
            else:
                risks_all = cens_all = months_all = np.zeros(0)
            try:
                c_index = concordance_index_censored(
                    (1 - cens_all).astype(bool), months_all, risks_all
                )[0]
            except ValueError:
                c_index = float("nan")
            out["val_c_index"] = c_index
            msg = (
                f"Epoch: {label}, val_loss: {out['val_loss']:.4f}, "
                f"val_c_index: {c_index:.4f}"
            )
        if self.verbose:
            print(msg)
        self.logger.log(
            {k: v for k, v in out.items() if not math.isnan(v)},
            step=epoch if isinstance(epoch, int) else None,
        )
        return out

    # -------------------------------------------------------------- test/export
    def test(self, epoch: int, save: bool = False, png: bool = False) -> None:
        """Leave-one-out inference + attention-map export
        (reference: mcat/main.py:158-183). ``png=True`` additionally renders
        each exported map as a heatmap/profile image next to the array —
        the reference leaves visualization to external tooling
        (README.md:37-39)."""
        if self.test_ds is None or len(self.test_ds) == 0:
            return
        c = self.config
        import datetime as _dt

        now = _dt.datetime.now().strftime("%Y%m%d%H%M%S")
        out_dir = c.training.test_output_dir
        os.makedirs(out_dir, exist_ok=True)
        batcher = BucketBatcher(
            self.test_ds, self.extras_fn, 1, self.buckets, shuffle=False
        )
        # GE exports the MIL 'path' scores [1, M] (ge_nacagat/main.py:140-142)
        # — the M x M map is never materialized; survival models export the
        # co-attention map [N, M] (mcat/main.py:180-183). Built once: a fresh
        # jit wrapper per call would recompile every tested epoch.
        if not hasattr(self, "_test_eval_step"):
            self._test_eval_step = make_eval_step(
                self.model, c.training.loss, alpha=c.training.alpha,
                ge_mode=self.ge_mode, need_attention=not self.ge_mode,
                omic_sizes=tuple(self.omic_sizes),
            )
        eval_attn = self._test_eval_step
        for bi, batch in enumerate(batcher.batches()):
            dev = self._device_batch(batch)
            res = eval_attn(self.state.params, dev)
            n_patches = int(batch["mask"][0].sum())
            if self.ge_mode:
                attn_map = np.asarray(res["attention"]["path"])[0, :, :n_patches]
                if self.verbose:
                    print(f"[{bi}] Gene Expression Class: {batch['label'][0]}")
                    print(f"Prediction: {np.asarray(res['y'])[0]}")
                    print(
                        f"Attn min: {attn_map.min():.6f}, Attn max: {attn_map.max():.6f}, "
                        f"Attn mean: {attn_map.mean():.6f}"
                    )
            else:
                attn_map = np.asarray(res["attention"]["coattn"])[0, :, :n_patches]
                if self.verbose:
                    risk = float(np.asarray(res["risk"])[0])
                    print(
                        f"[{bi}] Survival months: {batch['survival_months'][0]}, "
                        f"Survival class: {batch['label'][0]}, "
                        f"Censorship: {batch['censorship'][0]}"
                    )
                    print(
                        f"Hazards: {np.asarray(res['hazards'])[0]}, "
                        f"Survs: {np.asarray(res['survs'])[0]}, Risk: {risk:.4f}"
                    )
                    print(
                        f"Attn min: {attn_map.min():.6f}, Attn max: {attn_map.max():.6f}, "
                        f"Attn mean: {attn_map.mean():.6f}"
                    )
            if save:
                patient = c.training.leave_one_out
                ext = c.training.attn_export_format
                if self.ge_mode:
                    # GE naming has no model segment (ge_nacagat/main.py:140)
                    fname = f"ATTN_{patient}_{now}_E{epoch}_{bi}.{ext}"
                else:
                    fname = f"ATTN_{c.model.name}_{patient}_{now}_E{epoch}_{bi}.{ext}"
                path = os.path.join(out_dir, fname)
                if self.verbose:
                    print(f"Saving attention in {path}")
                if ext == "pt":
                    # drop-in compatible with the reference's torch.save
                    # export (mcat/main.py:180-183, ge_nacagat/main.py:140)
                    import torch

                    torch.save(torch.from_numpy(np.ascontiguousarray(attn_map)), path)
                else:
                    np.save(path, attn_map)
                if png:
                    from multimodal_path_omic_tpu.utils.visualize import (
                        save_attention_png,
                    )

                    labels = (
                        None
                        if self.ge_mode
                        else list(self.dataset.table.signature_names)
                    )
                    png_path = save_attention_png(
                        attn_map,
                        os.path.join(out_dir, fname),
                        row_labels=labels,
                        title=f"{c.model.name} · patient {patient} · epoch {epoch}",
                    )
                    if self.verbose:
                        print(f"Rendered attention heatmap {png_path}")

    # ------------------------------------------------------------- checkpoint
    def save(self, epoch: int, loss: float, tag: Optional[str] = None) -> str:
        payload = {
            "epoch": epoch + 1,  # resume starts at the NEXT epoch (gap fix)
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "rng": jax.random.key_data(self.state.rng),
            "step": self.state.step,
            "loss": loss,
            "seed": self.config.training.seed,
        }
        return ckpt.save_checkpoint(
            self.config.model.checkpoint_dir,
            payload,
            model_name=self.config.model.name,
            dataset_name=self.config.dataset.name,
            epoch=epoch,
            # async: orbax commits in the background while the next epoch
            # trains; fit() (and restore) join pending commits
            block=False,
            tag=tag,
        )

    def _place_state(self, state: TrainState) -> TrainState:
        """Commit a (restored) state to the SAME placement a fresh trainer's
        state has. Checkpoint restores hand back uncommitted arrays; feeding
        those to the jitted steps changes the program's input-sharding
        identity vs the fresh path, so every resumed run SILENTLY RECOMPILES
        everything (in-process jit cache miss + new persistent-cache keys —
        measured 103 s of avoidable compile on the flagship demo's resume
        phase). device_put here makes resume and fresh runs byte-identical
        programs."""
        if self.mesh is not None:
            from multimodal_path_omic_tpu.parallel.mesh import replicate

            return replicate(state, self.mesh)
        # single process, no mesh (the constructor raises on meshless
        # multi-process runs, so jax.local_devices()[0] is always addressable)
        return jax.device_put(state, jax.local_devices()[0])

    def restore(self, path: str) -> None:
        if self.verbose:
            print(f"Loading model checkpoint from {path}")
        ckpt.wait_for_checkpoints()  # the path may still be committing
        template = {
            "epoch": 0,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "rng": jax.random.key_data(self.state.rng),
            "step": self.state.step,
            "loss": 0.0,
            "seed": 0,
        }
        payload = ckpt.restore_checkpoint(path, template)
        self.state = self._place_state(
            TrainState(
                params=payload["params"],
                opt_state=payload["opt_state"],
                rng=jax.random.wrap_key_data(jnp.asarray(payload["rng"])),
                step=jnp.asarray(payload["step"], jnp.int32),
            )
        )
        self.starting_epoch = int(payload["epoch"])
        if self.config.training.bug_compat:
            # reference quirk: it saves the 0-indexed epoch it just finished
            # (mcat/main.py:96) and restores starting_epoch straight from it
            # (main.py:309-312, 323) — so a resumed run RE-TRAINS the saved
            # epoch. The payload stores epoch+1 (the fixed semantics);
            # subtract it back under --bug-compat.
            self.starting_epoch = max(0, self.starting_epoch - 1)
        # resume must reproduce the shuffle order an uninterrupted run would
        # use at this epoch (the batcher seeds each epoch as seed + epoch)
        self.train_batcher._epoch = self.starting_epoch

    def load_torch_checkpoint(self, path: str) -> None:
        """Drop-in restore of a reference PyTorch checkpoint's model weights."""
        from multimodal_path_omic_tpu.utils.transplant import (
            from_torch_state_dict,
            load_torch_checkpoint,
        )

        payload = load_torch_checkpoint(path)
        params = from_torch_state_dict(
            self.config.model.name,
            payload["model_state_dict"],
            {"params": self.state.params},
            n_signatures=len(self.omic_sizes),
            fusion=self.config.model.fusion,
        )
        self.state = self._place_state(
            self.state._replace(params=params["params"])
        )
        # a reference checkpoint's 'epoch' is the 0-indexed epoch it finished
        # (mcat/main.py:96); resume at the NEXT one — unless --bug-compat,
        # which keeps the reference's re-train-the-saved-epoch behavior
        # (main.py:309-312, 323)
        saved = int(payload.get("epoch", -1))
        self.starting_epoch = max(
            0, saved + (0 if self.config.training.bug_compat else 1)
        )
        self.train_batcher._epoch = self.starting_epoch

    def _monitor_key(self) -> str:
        """Resolve training.monitor: "auto" watches the family's headline
        validation metric (val_c_index for survival, val_accuracy for GE)."""
        m = self.config.training.monitor
        if m != "auto":
            return m
        return "val_accuracy" if self.ge_mode else "val_c_index"

    # -------------------------------------------------------------------- fit
    def fit(self) -> Dict[str, float]:
        c = self.config
        if self.verbose:
            print("Training started...")
        last: Dict[str, float] = {}
        # Best-model tracking / early stopping (training.keep_best /
        # training.early_stopping / training.monitor). validate() allgathers
        # metrics, so every process sees the same score — the stop decision
        # and the collective best-checkpoint save stay in lockstep on
        # multi-host runs.
        monitor = self._monitor_key()
        sign = -1.0 if monitor == "val_loss" else 1.0
        best_score = -math.inf
        best_epoch = -1
        stale = 0
        for epoch in range(self.starting_epoch, c.training.epochs):
            if self.verbose:
                print(f"Epoch: {epoch + 1}")
            t0 = time.time()
            train_out, val = self.validated_epoch(epoch)
            last.update(train_out)
            last.update(val)
            # a missing/NaN monitored metric counts as "no improvement"
            value = val.get(monitor, math.nan)
            score = sign * value if math.isfinite(value) else -math.inf
            if score > best_score:
                best_score, best_epoch, stale = score, epoch, 0
                if c.training.keep_best:
                    path = self.save(epoch, val.get("val_loss", 0.0), tag="best")
                    if self.verbose:
                        print(
                            f"New best {monitor}: {value:.4f} "
                            f"(epoch {epoch + 1}) -> {path}"
                        )
            else:
                stale += 1
            if self.leave_one_out:
                save = (epoch + 1) % c.training.output_attn_epoch == 0
                self.test(epoch + 1, save=save)
            if self.verbose:
                print(
                    "Time elapsed for epoch {}: {:.0f}s".format(
                        epoch + 1, time.time() - t0
                    )
                )
            if c.training.early_stopping and stale >= c.training.early_stopping:
                if self.verbose:
                    print(
                        f"Early stopping at epoch {epoch + 1}: no {monitor} "
                        f"improvement in {stale} validated epochs (best "
                        f"{sign * best_score:.4f} at epoch {best_epoch + 1})"
                    )
                break
        if best_epoch >= 0 and math.isfinite(best_score):
            last[f"best_{monitor}"] = sign * best_score
            last["best_epoch"] = float(best_epoch + 1)
        last.update(self.validate("final validation"))
        ckpt.wait_for_checkpoints()  # join pending async checkpoint commits
        self.logger.finish()
        return last


# Captured at class-definition time: validated_epoch compares against these to
# detect monkeypatched/overridden epoch methods and fall back to the serial
# train_epoch -> validate composition for them.
_DEFAULT_TRAIN_EPOCH = Trainer.train_epoch
_DEFAULT_VALIDATE = Trainer.validate


def main(config_path: str, overrides: Optional[Dict[str, Any]] = None):
    """Entry point equivalent to the reference's main(config_path)
    (mcat/main.py:218-340), for all model families."""
    from multimodal_path_omic_tpu.config import load_config

    cfg = load_config(config_path, overrides)
    trainer = Trainer(cfg)
    return trainer.fit()
