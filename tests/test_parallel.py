"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.parallel.mesh import make_mesh
from leafgrasp_tpu.parallel.sharding import (infer_param_shardings,
                                             shard_variables, shard_batch)
from leafgrasp_tpu.parallel.spatial import (sharded_nearest_seed_rows,
                                            sharded_squared_edt,
                                            sharded_edt,
                                            sharded_shift_rows)
from leafgrasp_tpu.parallel.batch import make_batched_frame_fn
from leafgrasp_tpu.ops.edt import edt, squared_edt, nearest_seed_dist_1d


def test_mesh_shapes():
    mesh = make_mesh(8, model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(6, model_axis=4)


def test_sharded_nearest_seed_matches_local():
    mesh = make_mesh(8, model_axis=1)
    mask, _ = make_leaf_scene(height=96, width=64, num_leaves=3, seed=2,
                              margin=12)
    seeds = mask > 0
    ours = np.asarray(sharded_nearest_seed_rows(seeds, mesh))
    ref = np.asarray(nearest_seed_dist_1d(seeds, axis=0))
    # sentinel values (no seed in column) may differ; compare where finite
    finite = ref < 96 + 64
    np.testing.assert_array_equal(ours[finite], ref[finite])
    assert (ours[~finite] >= 96).all()


def test_sharded_edt_matches_single_device():
    mesh = make_mesh(8, model_axis=1)
    mask, _ = make_leaf_scene(height=96, width=64, num_leaves=3, seed=4,
                              margin=12)
    seeds = mask > 0
    ours = np.asarray(sharded_edt(seeds, mesh))
    ref = np.asarray(edt(seeds))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("dy", [3, -3, 0, 12, -12])
def test_sharded_shift_rows(dy):
    mesh = make_mesh(8, model_axis=1)
    arr = np.arange(96 * 8, dtype=np.float32).reshape(96, 8)
    out = np.asarray(sharded_shift_rows(arr, dy, -1.0, mesh))
    expected = np.full_like(arr, -1.0)
    if dy > 0:
        expected[:-dy or None] = arr[dy:]
    elif dy < 0:
        expected[-dy:] = arr[:dy]
    else:
        expected = arr
    np.testing.assert_array_equal(out, expected)


def test_param_shardings_rules():
    from leafgrasp_tpu.vla.lm import init_vla, VLAModelConfig
    mesh = make_mesh(8, model_axis=2)
    cfg = VLAModelConfig(dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
                         mlp_hidden=64, vision_tokens=2, vision_patch=16)
    _, variables = init_vla(jax.random.PRNGKey(0), cfg)
    shardings = infer_param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {"/".join(str(getattr(p, "key", p)) for p in path): s.spec
             for path, s in flat}
    assert any("q_proj" in k and s == jax.sharding.PartitionSpec(
        None, "model") for k, s in specs.items())
    assert any("lm_head" in k and s == jax.sharding.PartitionSpec(
        None, "model") for k, s in specs.items())


def test_batched_frame_fn_dp():
    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig)
    mesh = make_mesh(4, model_axis=1)
    cfg = PipelineConfig(frame=FrameConfig(height=96, width=128,
                                           max_leaves=4),
                         leaf=LeafSelectionConfig(min_leaf_area=200))
    mask, depth = make_leaf_scene(96, 128, 3, seed=1, margin=16)
    b = 4
    masks = np.stack([np.roll(mask, i, 1) for i in range(b)])
    depths = np.stack([np.roll(depth, i, 1) for i in range(b)])
    fn = make_batched_frame_fn(mesh, cfg, with_cnn=False)
    res = fn(masks, depths, np.float32(64.0), np.float32(48.0),
             np.float32(200.0))
    assert np.asarray(res.grasp_uv).shape == (b, 2)
    # per-frame results equal the unbatched pipeline
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    single = make_frame_fn(cfg, with_cnn=False)
    r0 = single(masks[0], depths[0], np.float32(64.0), np.float32(48.0),
                np.float32(200.0))
    np.testing.assert_array_equal(np.asarray(res.grasp_uv)[0],
                                  np.asarray(r0.grasp_uv))


# ---------------------------------------------------------------------------
# row-sharded FULL frame pipeline (parallel/spatial_frame.py)
# ---------------------------------------------------------------------------

def _spatial_cfg(iso="union"):
    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig,
                                      GraspScoringConfig)
    return PipelineConfig(
        frame=FrameConfig(height=264, width=360, max_leaves=8),
        leaf=LeafSelectionConfig(min_leaf_area=500),
        grasp=GraspScoringConfig(isolation_context=iso))


def test_sharded_frame_cv_only_matches_unsharded():
    """The row-sharded program must reproduce the single-device pipeline:
    identical leaf id, grasp pixel and candidate set; float scores to
    psum-reduction-order tolerance."""
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    cfg = _spatial_cfg()
    mask, depth = make_leaf_scene(264, 360, num_leaves=4, seed=3,
                                  margin=40)
    cx, cy, f = np.float32(180.0), np.float32(135.0), np.float32(430.0)
    mesh = make_mesh(8, model_axis=1)
    r_sh = make_sharded_frame_fn(mesh, cfg, with_cnn=False)(
        mask, depth, cx, cy, f)
    r_un = make_frame_fn(cfg, with_cnn=False, use_pallas=False)(
        mask, depth, cx, cy, f)
    assert int(r_sh.leaf_id) == int(r_un.leaf_id)
    np.testing.assert_array_equal(np.asarray(r_sh.grasp_uv),
                                  np.asarray(r_un.grasp_uv))
    np.testing.assert_array_equal(np.asarray(r_sh.candidates.x),
                                  np.asarray(r_un.candidates.x))
    np.testing.assert_array_equal(np.asarray(r_sh.candidates.y),
                                  np.asarray(r_un.candidates.y))
    np.testing.assert_allclose(np.asarray(r_sh.candidates.score),
                               np.asarray(r_un.candidates.score),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_sh.grasp_xyz),
                               np.asarray(r_un.grasp_xyz), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_sh.pre_grasp_xyz),
                               np.asarray(r_un.pre_grasp_xyz), atol=1e-6)


@pytest.mark.parametrize("iso", ["union", "reference_self"])
def test_sharded_frame_cnn_matches_unsharded(iso):
    """CNN path: halo patch extraction + psum merge must reproduce the
    single-device 9-channel patch batch (fusion scores equal)."""
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    cfg = _spatial_cfg(iso)
    mask, depth = make_leaf_scene(264, 360, num_leaves=4, seed=7,
                                  margin=40)
    cx, cy, f = np.float32(180.0), np.float32(135.0), np.float32(430.0)
    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    mesh = make_mesh(8, model_axis=1)
    r_sh = make_sharded_frame_fn(mesh, cfg, with_cnn=True)(
        mask, depth, cx, cy, f, variables)
    r_un = make_frame_fn(cfg, with_cnn=True, use_pallas=False)(
        mask, depth, cx, cy, f, variables)
    assert int(r_sh.leaf_id) == int(r_un.leaf_id)
    np.testing.assert_array_equal(np.asarray(r_sh.grasp_uv),
                                  np.asarray(r_un.grasp_uv))
    assert bool(r_sh.ml_used) == bool(r_un.ml_used)
    np.testing.assert_allclose(np.asarray(r_sh.fusion.combined),
                               np.asarray(r_un.fusion.combined),
                               rtol=1e-4, atol=1e-5)


def test_sharded_frame_rejects_bad_shapes():
    from leafgrasp_tpu.config import PipelineConfig, FrameConfig
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    mesh = make_mesh(8, model_axis=1)
    with pytest.raises(ValueError):
        make_sharded_frame_fn(
            mesh, PipelineConfig(frame=FrameConfig(height=270, width=360)))


def test_sharded_frame_union_half_cv_only():
    """union_half configs must serve row-sharded in CV-only mode (the
    isolation fields are skipped entirely there); with_cnn=True stays
    rejected."""
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    cfg = _spatial_cfg("union_half")
    mask, depth = make_leaf_scene(264, 360, num_leaves=4, seed=3,
                                  margin=40)
    cx, cy, f = np.float32(180.0), np.float32(135.0), np.float32(430.0)
    mesh = make_mesh(8, model_axis=1)
    r_sh = make_sharded_frame_fn(mesh, cfg, with_cnn=False)(
        mask, depth, cx, cy, f)
    r_un = make_frame_fn(cfg, with_cnn=False, use_pallas=False)(
        mask, depth, cx, cy, f)
    np.testing.assert_array_equal(np.asarray(r_sh.grasp_uv),
                                  np.asarray(r_un.grasp_uv))
    with pytest.raises(NotImplementedError):
        make_sharded_frame_fn(mesh, cfg, with_cnn=True)


def test_sharded_frame_pallas_scoring_matches_oracle():
    """The fused Pallas scoring kernel inside the shard body (interpret
    mode on CPU) must reproduce the sharded oracle composition."""
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    cfg = _spatial_cfg("reference_self")
    mask, depth = make_leaf_scene(264, 360, num_leaves=4, seed=5,
                                  margin=40)
    cx, cy, f = np.float32(180.0), np.float32(135.0), np.float32(430.0)
    mesh = make_mesh(8, model_axis=1)
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    r_k = make_sharded_frame_fn(mesh, cfg, with_cnn=True,
                                use_pallas=True)(
        mask, depth, cx, cy, f, variables)
    r_o = make_sharded_frame_fn(mesh, cfg, with_cnn=True,
                                use_pallas=False)(
        mask, depth, cx, cy, f, variables)
    assert int(r_k.leaf_id) == int(r_o.leaf_id)
    np.testing.assert_array_equal(np.asarray(r_k.grasp_uv),
                                  np.asarray(r_o.grasp_uv))
    np.testing.assert_allclose(np.asarray(r_k.fusion.combined),
                               np.asarray(r_o.fusion.combined),
                               rtol=2e-4, atol=2e-5)


def test_sharded_frame_production_scale_matches_unsharded():
    """Full production-scale (1080x1440, min_area 10000, production
    camera) row-sharded frame on the 8-way mesh vs the single-chip
    pipeline: identical leaf, grasp pixel, 3D grasp and pre-grasp.
    Covers the exact-minAreaRect orientation path (local _row_runs +
    all_gather + replicated hull) at the scale the reference node
    operates (leaf_grasp_node_v3.py:31-37)."""
    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig)
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    cfg = PipelineConfig(
        frame=FrameConfig(height=1080, width=1440, max_leaves=8),
        leaf=LeafSelectionConfig(min_leaf_area=10000))
    mask, depth = make_leaf_scene(1080, 1440, num_leaves=6, seed=8,
                                  margin=120)
    cx, cy, f = (np.float32(707.87), np.float32(494.07),
                 np.float32(1750.68))
    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    mesh = make_mesh(8, model_axis=1)
    r_sh = make_sharded_frame_fn(mesh, cfg, with_cnn=True)(
        mask, depth, cx, cy, f, variables)
    r_un = make_frame_fn(cfg, with_cnn=True, use_pallas=False)(
        mask, depth, cx, cy, f, variables)
    assert int(r_sh.leaf_id) == int(r_un.leaf_id)
    np.testing.assert_array_equal(np.asarray(r_sh.grasp_uv),
                                  np.asarray(r_un.grasp_uv))
    assert bool(r_sh.ml_used) == bool(r_un.ml_used)
    np.testing.assert_allclose(np.asarray(r_sh.grasp_xyz),
                               np.asarray(r_un.grasp_xyz), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_sh.pre_grasp_xyz),
                               np.asarray(r_un.pre_grasp_xyz), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_sh.fusion.combined),
                               np.asarray(r_un.fusion.combined),
                               rtol=1e-4, atol=1e-5)


def test_sharded_orientation_fragmented_leaf():
    """A fragmented selected leaf whose components straddle shard-row
    boundaries: the sharded run-graph labeling (local _mask_row_runs +
    all_gather + replicated hull) must agree with the single-chip exact
    minAreaRect -- same grasp pixel."""
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    cfg = _spatial_cfg("reference_self")
    h, w = 264, 360
    mask = np.zeros((h, w), np.int32)
    # leaf 1: large blob crossing shard rows 33/66/99, with a bite
    # splitting off a second component that also crosses a boundary
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((xx - 150.0) / 90) ** 2 + ((yy - 80.0) / 55) ** 2 <= 1
    bite = (xx >= 108) & (xx <= 118)       # occluding stripe: 2 parts
    mask[blob & ~bite] = 1
    # a second, smaller leaf so selection is non-trivial
    blob2 = ((xx - 270.0) / 40) ** 2 + ((yy - 200.0) / 30) ** 2 <= 1
    mask[blob2] = 2
    import scipy.ndimage as ndi
    assert ndi.label(mask == 1, structure=np.ones((3, 3)))[1] >= 2, \
        "fixture must be fragmented"
    depth = np.full((h, w), 0.5, np.float32)
    depth += 0.05 * (yy / h).astype(np.float32)
    cx, cy, f = np.float32(180.0), np.float32(135.0), np.float32(430.0)
    mesh = make_mesh(8, model_axis=1)
    r_sh = make_sharded_frame_fn(mesh, cfg, with_cnn=False)(
        mask, depth, cx, cy, f)
    r_un = make_frame_fn(cfg, with_cnn=False, use_pallas=False)(
        mask, depth, cx, cy, f)
    assert int(r_sh.leaf_id) == int(r_un.leaf_id)
    np.testing.assert_array_equal(np.asarray(r_sh.grasp_uv),
                                  np.asarray(r_un.grasp_uv))


# ---------------------------------------------------------------- pipeline --

def _tiny_llava(layers=8, sliding_window=None):
    from leafgrasp_tpu.vla.llava_jax import LlavaJax, LlavaJaxConfig
    cfg = LlavaJaxConfig(
        vis_hidden=16, vis_intermediate=32, vis_layers=1, vis_heads=2,
        image_size=28, patch_size=14, vocab_size=64, hidden=16,
        intermediate=32, layers=layers, heads=2, kv_heads=1,
        image_token_index=60, sliding_window=sliding_window)
    model = LlavaJax(cfg)
    ids = np.array([[1, 60, 60, 60, 60, 2, 7, 9]], np.int32)
    ids = np.tile(ids, (4, 1))
    px = np.linspace(-1, 1, 4 * 28 * 28 * 3, dtype=np.float32)
    px = px.reshape(4, 28, 28, 3)
    variables = model.init(jax.random.PRNGKey(0), jax.numpy.asarray(ids),
                           pixel_values=jax.numpy.asarray(px))
    return model, variables, ids, px


@pytest.mark.parametrize("n_micro,sliding", [(4, None), (2, 3)])
def test_pp_llava_forward_matches_plain(n_micro, sliding):
    """GPipe forward over 8 pipeline stages == plain LlavaJax.apply."""
    from leafgrasp_tpu.parallel.pipeline import (make_pp_llava_forward,
                                                 shard_stage_params,
                                                 split_decoder_stages)
    mesh = make_mesh(8, model_axis=1)
    model, variables, ids, px = _tiny_llava(sliding_window=sliding)
    ref, _ = jax.jit(lambda v, i, p: model.apply(v, i, pixel_values=p))(
        variables, ids, px)

    stages, rest = split_decoder_stages(variables, model.cfg, 8)
    stages = shard_stage_params(mesh, stages)
    fn = make_pp_llava_forward(mesh, model, n_microbatches=n_micro)
    out = fn(rest, stages, ids, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pp_llava_on_model_axis_and_last_only():
    """Pipeline over the 'model' axis of a (2, 4) mesh; last-pos logits."""
    from leafgrasp_tpu.parallel.pipeline import (make_pp_llava_forward,
                                                 shard_stage_params,
                                                 split_decoder_stages)
    mesh = make_mesh(8, model_axis=4)
    model, variables, ids, px = _tiny_llava()
    ref, _ = jax.jit(lambda v, i, p: model.apply(v, i, pixel_values=p))(
        variables, ids, px)

    stages, rest = split_decoder_stages(variables, model.cfg, 4)
    stages = shard_stage_params(mesh, stages, axis="model")
    fn = make_pp_llava_forward(mesh, model, n_microbatches=4,
                               axis="model", logits_last_only=True)
    out = fn(rest, stages, ids, px)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref)[:, -1:],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_pp_llava_grad_matches_plain(remat):
    """jax.grad through the pipeline (ppermute transposes) == plain
    grads -- for the staged layer params AND the replicated rest
    (embed/vision/norm/head), whose grads flow through the psum/where
    transposes."""
    from leafgrasp_tpu.parallel.pipeline import (make_pp_llava_forward,
                                                 shard_stage_params,
                                                 split_decoder_stages)
    mesh = make_mesh(8, model_axis=1)
    model, variables, ids, px = _tiny_llava()
    tgt = np.arange(4 * 8, dtype=np.int64).reshape(4, 8) % 64

    def plain_loss(params):
        logits, _ = model.apply({"params": params}, ids, pixel_values=px)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp_take_loss(lp, tgt)

    def jnp_take_loss(lp, tgt):
        import jax.numpy as jnp
        oh = jax.nn.one_hot(jnp.asarray(tgt), lp.shape[-1])
        return jnp.mean(jnp.sum(lp * oh, axis=-1))

    ref_grads = jax.jit(jax.grad(plain_loss))(variables["params"])

    stages, rest = split_decoder_stages(variables, model.cfg, 8)
    stages_s = shard_stage_params(mesh, stages)
    fn = make_pp_llava_forward(mesh, model, n_microbatches=4, remat=remat)

    def pp_loss(rest_and_stages):
        r, st = rest_and_stages
        logits = fn(r, st, ids, px)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp_take_loss(lp, tgt)

    rest_grads, pp_grads = jax.jit(jax.grad(pp_loss))((rest, stages_s))

    # re-stack the plain per-layer grads into the (S, L/S, ...) layout
    layer_grads = [ref_grads[f"layer_{i}"] for i in range(8)]
    want = jax.tree.map(lambda *xs: np.stack(xs)[:, None], *layer_grads)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
        pp_grads, want)
    # rest grads (embed_tokens, vision tower, norm, lm_head) match too
    want_rest = {k: ref_grads[k] for k in rest_grads}
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
        rest_grads, want_rest)


def test_pp_llava_forward_quantized():
    """PP forward over an int8-quantized model == plain quantized apply
    (covers the QuantDense lm_head in the replicated head projection)."""
    import dataclasses
    from leafgrasp_tpu.parallel.pipeline import (make_pp_llava_forward,
                                                 shard_stage_params,
                                                 split_decoder_stages)
    from leafgrasp_tpu.vla.llava_jax import LlavaJax
    from leafgrasp_tpu.vla.quant import quantize_llava_variables

    mesh = make_mesh(8, model_axis=1)
    model, variables, ids, px = _tiny_llava()
    qcfg = dataclasses.replace(model.cfg, quantized=True, quant_group=8)
    qmodel = LlavaJax(qcfg)
    qvars = quantize_llava_variables(variables)
    ref, _ = jax.jit(lambda v, i, p: qmodel.apply(v, i, pixel_values=p))(
        qvars, ids, px)

    stages, rest = split_decoder_stages(qvars, qcfg, 8)
    stages = shard_stage_params(mesh, stages)
    fn = make_pp_llava_forward(mesh, qmodel, n_microbatches=4)
    out = fn(rest, stages, ids, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pp_llava_forward_image_features():
    """Anyres-style packed image_features pass through the PP forward
    identically to the plain model (llava_jax.py:364-374 semantics)."""
    from leafgrasp_tpu.parallel.pipeline import (make_pp_llava_forward,
                                                 shard_stage_params,
                                                 split_decoder_stages)
    mesh = make_mesh(8, model_axis=1)
    model, variables, ids, _ = _tiny_llava()
    # 4 rows x 4 image tokens = 16 packed feature rows
    feats = jax.random.normal(jax.random.PRNGKey(3),
                              (16, model.cfg.hidden), jnp_dtype())
    ref, _ = jax.jit(lambda v, i, f: model.apply(v, i, image_features=f))(
        variables, ids, feats)

    stages, rest = split_decoder_stages(variables, model.cfg, 8)
    stages = shard_stage_params(mesh, stages)
    fn = make_pp_llava_forward(mesh, model, n_microbatches=4)
    out = fn(rest, stages, ids, image_features=feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def jnp_dtype():
    import jax.numpy as jnp
    return jnp.float32


def test_pp_tp_llava_forward_matches_plain():
    """PP over 'data' x TP over 'model' on a (4, 2) mesh: stages hold
    layer-slice x head-slice params; Megatron psums restore the full
    o_proj/down_proj outputs. Matches the plain forward."""
    from leafgrasp_tpu.parallel.pipeline import (make_pp_llava_forward,
                                                 shard_stage_params,
                                                 split_decoder_stages)
    from leafgrasp_tpu.vla.llava_jax import LlavaJax, LlavaJaxConfig

    mesh = make_mesh(8, model_axis=2)   # data=4 (PP), model=2 (TP)
    cfg = LlavaJaxConfig(
        vis_hidden=16, vis_intermediate=32, vis_layers=1, vis_heads=2,
        image_size=28, patch_size=14, vocab_size=64, hidden=16,
        intermediate=32, layers=8, heads=4, kv_heads=2,
        image_token_index=60)
    model = LlavaJax(cfg)
    ids = np.tile(np.array([[1, 60, 60, 60, 60, 2, 7, 9]], np.int32),
                  (4, 1))
    px = np.linspace(-1, 1, 4 * 28 * 28 * 3, dtype=np.float32)
    px = px.reshape(4, 28, 28, 3)
    variables = model.init(jax.random.PRNGKey(0), jax.numpy.asarray(ids),
                           pixel_values=jax.numpy.asarray(px))
    ref, _ = jax.jit(lambda v, i, p: model.apply(v, i, pixel_values=p))(
        variables, ids, px)

    stages, rest = split_decoder_stages(variables, cfg, 4)
    stages = shard_stage_params(mesh, stages, axis="data",
                                tp_axis="model")
    # verify the TP sharding actually split the kernels both ways
    qk = stages["self_attn"]["q_proj"]["kernel"]
    shard_shapes = {s.data.shape for s in qk.addressable_shards}
    assert shard_shapes == {(1, 2, 16, 8)}   # (S/4, L/S, in, out/2)
    ok = stages["self_attn"]["o_proj"]["kernel"]
    assert {s.data.shape for s in ok.addressable_shards} == {(1, 2, 8, 16)}

    fn = make_pp_llava_forward(mesh, model, n_microbatches=4,
                               tp_axis="model")
    out = fn(rest, stages, ids, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pp_tp_rejects_indivisible_heads():
    from leafgrasp_tpu.parallel.pipeline import make_pp_llava_forward
    mesh = make_mesh(8, model_axis=2)
    model, *_ = _tiny_llava()          # kv_heads=1, not divisible by 2
    with pytest.raises(ValueError, match="TP size"):
        make_pp_llava_forward(mesh, model, n_microbatches=4,
                              tp_axis="model")


def test_pp_split_rejects_indivisible():
    from leafgrasp_tpu.parallel.pipeline import split_decoder_stages
    model, variables, *_ = _tiny_llava(layers=6)
    with pytest.raises(ValueError):
        split_decoder_stages(variables, model.cfg, 4)
