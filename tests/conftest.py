"""Test environment: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, so this lives at
the very top of conftest (pytest imports conftest before test modules).
"""

import os
import sys

# Force CPU regardless of the ambient platform: this environment's jax plugin
# overrides the JAX_PLATFORMS env var with "axon,cpu", so the env var alone is
# NOT enough — the config must be updated after import, before backend init.
# MPOT_TEST_TPU=1 opts out, for the TPU-hardware kernel tests
# (tests/test_kernels_tpu.py) which need the real chip's PRNG.
_want_tpu = os.environ.get("MPOT_TEST_TPU") == "1"
if not _want_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if not _want_tpu:
    jax.config.update("jax_platforms", "cpu")
# This JAX build defaults f32 matmuls to low (bf16-like) precision; parity
# tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: model train-step compiles dominate test time
# on CPU; cache them across test processes/runs.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import multimodal_path_omic_tpu` works without install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Test tiers. The full suite takes ~15-18 min on a 1-CPU host; the fast tier
# (`pytest -m "not slow"`) keeps a broad correctness net in a few minutes.
# Tier membership is centralized here (measured call durations, conftest is
# the one place to re-tier) instead of scattering @pytest.mark.slow across
# files; tests may still carry explicit markers.
_SLOW_TESTS = {
    # multi-device / mesh e2e (full Trainer runs over 8 virtual devices)
    "test_ge_ring_mesh_training_step",
    "test_dryrun_multichip_entrypoint",
    "test_mcat_with_ring_mesh_matches_plain",
    "test_ge_model_with_ring_mesh_matches_plain",
    "test_trainer_ge_sequence_parallel_e2e",
    "test_trainer_mcat_sequence_parallel_e2e",
    "test_trainer_data_parallel_e2e",
    "test_patch_dropout_mesh_matches_single_device",
    "test_ring_attention_no_mask",
    # torch-reference gradient parity (builds + runs the actual reference)
    "test_mcat_ces_gradient_parity",
    "test_ge_nacagat_ce_gradient_parity",
    "test_nacagat_cesar_gradient_parity",
    # trainer e2e flows
    "test_compilation_cache_dir_knob",
    "test_bfloat16_compute_eval_parity_tolerance",
    "test_bfloat16_compute_e2e",
    "test_device_cache_multi_bucket_identical",
    "test_resume_equals_uninterrupted_training",
    "test_auto_dispatch_byte_cap",
    "test_device_cache_with_multi_step_dispatch",
    "test_device_cache_training_identical",
    "test_ge_device_cache_training_identical",
    "test_device_cache_with_leave_one_out_export",
    "test_long_soak_training_stays_finite",
    "test_trainer_native_pipeline_on_off_identical",
    "test_grouped_dispatch_owns_pipelined_slot_views",
    "test_trainer_steps_per_dispatch_e2e",
    "test_mcat_learns_planted_signal_well",
    "test_bag_beyond_largest_bucket_trains",
    "test_checkpoint_save_restore",
    "test_exp_scheduler_decays_lr",
    "test_cosine_scheduler_e2e",
    "test_nacagat_cesar_end_to_end",
    "test_mcat_end_to_end",
    # quantization e2e
    "test_int8_cache_equals_int8_transfer_exactly",
    "test_int8_transfer_e2e_learns",
    # kernels-in-model e2e
    "test_mcat_with_pallas_coattention_matches_xla_path",
    # model shape sweeps
    "test_mcat_shapes",
    "test_mcat_padding_invariance",
    "test_ge_padding_invariance",
    "test_nacagat_padding_invariance",
    "test_mcat_no_attention_when_not_requested",
    # ring / seq-parallel gradient checks (large vjp traces on 1 CPU)
    "test_ring_attention_grads_match_local_reference",
    "test_seq_parallel_cross_attention_dropout_grads_finite",
    "test_seq_parallel_cross_attention_dropout_exact_semantics",
    "test_nacagat_with_ring_mesh_matches_plain",
    # kernel dispatch-in-train-step checks
    "test_nacagat_ces_train_step_dispatches_pregated_kernel",
    "test_nacagat_cesar_train_step_dispatches_kernel_via_ssq",
    "test_nacagat_train_step_with_dropout_dispatches_kernel_on_tpu",
    "test_nacagat_need_weights_dispatches_chunked_emission",
    # e2e flows with faster siblings kept in the fast tier
    # (test_cli_train / test_nacagat_small_bag_training_stays_on_xla /
    #  test_mcat_fusions / test_resume_* cover the same areas)
    "test_cli_convert_checkpoint_roundtrip",
    "test_bilinear_fusion_dropout_engages_in_training",
    "test_restored_trainer_lowers_identical_programs",
    "test_bug_compat_resume_retrains_saved_epoch",
    # AOT bundle e2e (MCAT parity + GE + errors stay in the fast tier)
    "test_exported_batch_rows_align_with_request",
    "test_bundle_http_server_matches_predictor",
    # CV e2e (fold properties + split_rows plumbing stay fast)
    "test_cross_validation_e2e",
    "test_cv_validates_fold_indices_and_namespaces_checkpoints",
    # GE model with the forced-interpret milpool kernel (M=4096 on 1 CPU;
    # the standalone kernel parity tests stay fast)
    "test_ge_eval_dispatches_milpool_kernel_and_matches",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
        if "multihost" in item.nodeid:
            item.add_marker(_pytest.mark.slow)
            item.add_marker(_pytest.mark.multihost)
        if "test_kernels_tpu" in item.nodeid:
            item.add_marker(_pytest.mark.tpu)
