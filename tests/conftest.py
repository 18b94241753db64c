"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: the suite re-jits the same static shapes on
# every run; caching cuts wall-clock by an order of magnitude.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_leafgrasp_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the 'axon' TPU backend and
# forces jax_platforms='axon,cpu'; override it after import so the suite
# runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fast/slow split (VERDICT r2 item 8): tests measured >~15 s warm-cache
# on this one-core box are auto-marked `slow` so `-m "not slow"` stays a
# pre-commit habit (~5 min) while the full suite remains the CI gate.
# Keyed by (file basename, test function name) — parametrized families
# are marked as a whole via the original function name.
_SLOW = {
    ("test_aux_components.py", "test_vla_sweep_two_experiments"),
    ("test_aux_components.py", "test_teacher_select_in_safe_zone"),
    ("test_aux_components.py", "test_collect_from_framelog_session"),
    ("test_aux_components.py", "test_collect_from_frames"),
    ("test_aux_components.py", "test_grasp_quality_predictor"),
    ("test_checkpoint_io.py", "test_serve_llava_cli_end_to_end"),
    ("test_checkpoint_io.py", "test_load_checkpoint_quantized_qlora"),
    ("test_checkpoint_io.py",
     "test_real_dims_sharded_quantized_load_and_serve"),
    ("test_host_shell.py", "test_grasp_service_pipelined_vla_rerank"),
    ("test_geometry.py", "test_union_half_isolation_close_to_full"),
    ("test_geometry.py", "test_pipeline_cloud_cross_check"),
    ("test_geometry.py", "test_fuzz_pipeline_vs_oracle"),
    ("test_geometry.py", "test_grasp_scores_match_oracle"),
    ("test_host_shell.py", "test_grasp_service_spatial_mesh"),
    ("test_host_shell.py", "test_visualizer_renders_and_saves"),
    ("test_host_shell.py", "test_grasp_service_vla_rerank"),
    ("test_host_shell.py", "test_grasp_service_end_to_end"),
    ("test_lifecycle.py", "test_full_self_supervised_lifecycle"),
    ("test_llava_jax.py", "test_scorer_anyres_matches_sequential_next_path"),
    ("test_model_pipeline.py", "test_pipeline_with_cnn_end_to_end"),
    ("test_model_pipeline.py", "test_architecture_param_counts_ordering"),
    ("test_model_pipeline.py", "test_pipeline_cv_only_end_to_end"),
    ("test_model_pipeline.py", "test_cnn_train_mode_mutates_batch_stats"),
    ("test_ops_edt.py", "test_scorer_band_flag_is_bit_exact"),
    ("test_ops_misc.py", "test_min_area_rect_matches_cv2"),
    ("test_ops_misc.py", "test_largest_component_labeling_adversarial"),
    ("test_ops_misc.py", "test_min_area_rect_empty_and_full"),
    ("test_pallas.py", "test_fused_scoring_matches_oracle"),
    ("test_pallas.py", "test_fused_scoring_empty_leaf_orientation_fallback"),
    ("test_pallas.py", "test_model_pallas_attention_flag_same_params"),
    ("test_pallas.py", "test_leaf_stats_pallas_median_parity"),
    ("test_parallel.py", "test_sharded_frame_production_scale_matches_unsharded"),
    ("test_parallel.py", "test_batched_frame_fn_dp"),
    ("test_parallel.py", "test_sharded_frame_cnn_matches_unsharded"),
    ("test_parallel.py", "test_sharded_orientation_fragmented_leaf"),
    ("test_parallel.py", "test_pp_llava_grad_matches_plain"),
    ("test_parallel.py", "test_pp_llava_forward_matches_plain"),
    ("test_parallel.py", "test_sharded_frame_pallas_scoring_matches_oracle"),
    ("test_parallel.py", "test_param_shardings_rules"),
    ("test_parallel.py", "test_sharded_frame_cv_only_matches_unsharded"),
    ("test_quant.py", "test_int4_packed_storage_matches_native"),
    ("test_training.py", "test_trainer_learns_separable_toy"),
    ("test_training.py", "test_sweep_runs_and_ranks"),
    ("test_training.py", "test_trainer_data_parallel_matches_shapes"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = (item.fspath.basename,
               getattr(item, "originalname", None) or item.name)
        if key in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def small_scene():
    """270x360 synthetic scene: fast enough for exact-EDT oracles."""
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    mask, depth = make_leaf_scene(height=270, width=360, num_leaves=4,
                                  seed=3, margin=40)
    return mask, depth


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
