"""Test config: force an 8-device virtual CPU platform before jax is used.

This is the JAX-native 'fake backend' for distributed testing (SURVEY.md §4):
multi-device sharding tests run on 8 virtual CPU devices without a TPU pod.

NOTE: this environment's sitecustomize registers the `axon` TPU PJRT plugin
at interpreter startup and force-sets jax.config jax_platforms='axon,cpu',
so env vars alone (JAX_PLATFORMS=cpu) are NOT enough — jax is already
imported and configured by the time conftest runs.  We must override via
jax.config.update *after* import, before any backend is initialized.
Without this, the whole suite silently runs over the TPU tunnel (~100x
slower per test and flaky on tiny shapes).
"""

import os

# XLA_FLAGS is read lazily when the CPU client is first created, so setting
# it here (before any jax computation) still takes effect.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite compiles the full model dozens of
# times on a 1-core host; repeat runs hit the cache and finish in minutes.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --- fast tier -------------------------------------------------------------
# `pytest -m smoke` is the iterate loop (SURVEY.md §4: velocity is part of
# the test obligation); the full suite stays the pre-commit gate.  Every test
# NOT listed below (and not marked `slow`) is auto-marked `smoke`.  The list
# is the measured set of tests whose COLD call time was >= 30 s on the 1-core
# host (pytest --durations=0, 2026-08-21, full suite 2h10 cold / 186 passed)
# — cold-time exclusion is conservative: warm, the smoke tier runs in a few
# minutes.  When adding a compile-heavy test (full train step, big encoder,
# subprocess respawn), add its nodeid here or mark it `slow`.
_NON_SMOKE = {
    "tests/test_cli.py::test_online_eval_batched_matches_b1",
    "tests/test_cli.py::test_retrain_fresh_dir_and_online_eval",
    "tests/test_cli.py::test_retrain_reused_logdir_resets_and_best_restores",
    "tests/test_cli.py::test_spatial_shards_test_driver",
    "tests/test_cli.py::test_train_test_eval_chain",
    "tests/test_cli_spatial.py::test_train_and_infer_2d_spatial",
    "tests/test_convergence.py::test_densenet_remat_fits_synthetic_scene",
    "tests/test_convergence.py::test_densenet_spatial_remat_fits_synthetic_scene",
    "tests/test_convergence.py::test_training_fits_synthetic_scene",
    "tests/test_export.py::test_export_cli_end_to_end",
    "tests/test_export.py::test_export_roundtrip_matches_forward[nyu]",
    "tests/test_finetune_flags.py::test_bn_no_track_stats_keeps_stats",
    "tests/test_finetune_flags.py::test_frozen_params_do_not_move",
    "tests/test_graft_entry.py::test_dryrun_multichip_direct",
    "tests/test_graft_entry.py::test_dryrun_multichip_self_provisions",
    "tests/test_model.py::test_bf16_compute_dtype_runs",
    "tests/test_model.py::test_bts_model_forward_shapes",
    "tests/test_model.py::test_bts_model_train_mode_has_batch_stats",
    "tests/test_model.py::test_encoder_feature_pyramid[densenet121_bts]",
    "tests/test_model.py::test_encoder_feature_pyramid[densenet161_bts]",
    "tests/test_multiprocess.py::test_two_process_matches_single_process",
    "tests/test_preemption.py::test_sigterm_checkpoints_and_resumes",
    "tests/test_serving.py::test_concurrent_requests_microbatch",
    "tests/test_spatial_sharding.py::test_grad_accum_spatial_matches_single",
    "tests/test_spatial_sharding.py::test_spatial_2d_train_matches_single",
    "tests/test_spatial_sharding.py::test_spatial_train_matches_single",
    "tests/test_spatial_sharding.py::test_spatial_train_odd_raw_height",
    "tests/test_tail.py::test_fused_tail_never_in_training_graph",
    "tests/test_tail.py::test_model_fused_tail_focal_scaling",
    "tests/test_tail.py::test_model_fused_tail_matches_literal_path",
    "tests/test_torch_converter.py::test_mapping_covers_all_leaves[densenet161_bts]",
    "tests/test_torch_converter.py::test_roundtrip_exact[densenet121_bts]",
    "tests/test_torch_oracle.py::test_full_model_torch_checkpoint_import",
    "tests/test_training.py::test_grad_accum_data_parallel_mesh_matches_single",
    "tests/test_training.py::test_grad_accum_duplicated_microbatch_exact",
    "tests/test_training.py::test_grad_accum_reduces_loss_and_updates_bn",
    "tests/test_training.py::test_grad_accum_rejects_indivisible_batch",
    "tests/test_training.py::test_profile_trace_closed_when_run_ends_before_stop_step",
    "tests/test_training.py::test_train_step_data_parallel_mesh_matches_single[dilated]",
    "tests/test_training.py::test_train_step_data_parallel_mesh_matches_single[literal]",
    "tests/test_training.py::test_train_step_reduces_loss",
    "tests/test_zero.py::test_zero1_composes_with_grad_accum",
    "tests/test_zero.py::test_zero1_composes_with_spatial",
    "tests/test_zero.py::test_zero1_elastic_restore_across_device_counts",
    "tests/test_zero.py::test_zero1_trainer_and_checkpoint_roundtrip",
    "tests/test_zero.py::test_zero1_train_matches_replicated",
    # -- warm offenders (measured on a WARM cache, same host/date): these stay
    # slow every run — the XLA:CPU AOT cache never reloads some entries (the
    # cpu_aot_loader machine-feature quirk, see CLAUDE.md), TF import time
    # (test_tf_parity), or Pallas interpret mode.  Excluding them takes the
    # smoke tier from a measured 10:05 to 5-7 min warm (the residual
    # run-to-run variance is WHICH cache entries refuse to reload on a given
    # run — the spiking test changes between runs, so chasing individual
    # tests below this point converges poorly).
    "tests/test_cli.py::test_sequence_driver",
    "tests/test_export.py::test_export_roundtrip_matches_forward[kitti]",
    "tests/test_finetune_flags.py::test_freeze_mask_scoped_to_encoder",
    "tests/test_model.py::test_encoder_feature_pyramid[resnet101_bts]",
    "tests/test_model.py::test_focal_scaling",
    "tests/test_ops.py::test_pallas_kernel_interpret_fwd_bwd",
    "tests/test_spatial_sharding.py::test_fused_upconv_spatial_gradients",
    "tests/test_spatial_sharding.py::test_spatial_eval_with_pallas_interpret",
    "tests/test_tf_parity.py::test_forward_parity",
    "tests/test_tf_parity.py::test_forward_parity_is_sensitive",
    "tests/test_tf_parity.py::test_stream_counts_align",
    "tests/test_torch_converter.py::test_mapping_covers_all_leaves[densenet121_bts]",
    "tests/test_torch_converter.py::test_roundtrip_exact[mobilenetv2_bts]",
    "tests/test_torch_converter.py::test_roundtrip_exact[resnet50_bts]",
    "tests/test_torch_oracle.py::test_encoder_matches_torch_oracle[densenet121_bts]",
    "tests/test_training.py::test_eval_step_shapes",
    "tests/test_finetune_flags.py::test_pretrained_npz_roundtrip",
    "tests/test_torch_oracle.py::test_same_padding_differs_from_torch_negative_control",
    "tests/test_torch_oracle.py::test_decoder_matches_torch_oracle[False]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _NON_SMOKE or item.get_closest_marker("slow"):
            continue
        item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
