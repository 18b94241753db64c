"""EDT parity vs scipy (exact) and cv2 DIST_MASK_PRECISE (exact)."""

import numpy as np
import pytest

import jax.numpy as jnp

import cv2
import scipy.ndimage as ndi

from leafgrasp_tpu.ops.edt import edt, squared_edt, signed_edt


def _scipy_dist_to_seeds(seeds):
    # scipy: distance from nonzero input to nearest ZERO -> invert seeds.
    return ndi.distance_transform_edt(~seeds)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edt_matches_scipy_random(seed, rng):
    h, w = 93, 131
    seeds = np.zeros((h, w), bool)
    pts = rng.integers(0, [h, w], size=(25, 2))
    seeds[pts[:, 0], pts[:, 1]] = True

    ours = np.asarray(edt(seeds))
    ref = _scipy_dist_to_seeds(seeds)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_edt_on_leaf_scene(small_scene):
    mask, _ = small_scene
    fg = mask > 0

    # distance of background pixels to nearest leaf (skfmm.distance
    # equivalent used at leaf_scorer.py:66-71)
    ours = np.asarray(edt(fg))
    ref = _scipy_dist_to_seeds(fg)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)

    # inside-distance (cv2.distanceTransform on the leaf mask,
    # grasp_point_selector.py:266) -- compare vs cv2 exact mode
    leaf = (mask == 1).astype(np.uint8)
    ours_in = np.asarray(edt(~(leaf > 0)))
    ref_cv = cv2.distanceTransform(leaf, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    np.testing.assert_allclose(ours_in * (leaf > 0), ref_cv, rtol=1e-4,
                               atol=5e-3)


def test_squared_edt_zero_on_seeds():
    seeds = np.zeros((17, 33), bool)
    seeds[5, 7] = True
    d2 = np.asarray(squared_edt(seeds))
    assert d2[5, 7] == 0.0
    assert d2[5, 8] == 1.0
    assert d2[6, 8] == 2.0


def test_signed_edt_signs(small_scene):
    mask, _ = small_scene
    leaf = mask == 1
    s = np.asarray(signed_edt(leaf))
    assert (s[leaf] >= 0).all()
    assert (s[~leaf] <= 0).all()
    # parity vs the reference construction dist_in - dist_out
    din = cv2.distanceTransform(leaf.astype(np.uint8), cv2.DIST_L2,
                                cv2.DIST_MASK_PRECISE)
    dout = cv2.distanceTransform((~leaf).astype(np.uint8), cv2.DIST_L2,
                                 cv2.DIST_MASK_PRECISE)
    np.testing.assert_allclose(s, din - dout, rtol=1e-4, atol=5e-3)


def test_no_seeds_gives_large_sentinel():
    seeds = np.zeros((8, 8), bool)
    d2 = np.asarray(squared_edt(seeds))
    assert np.isfinite(d2).all()
    assert (d2 >= 64).all()


def test_odd_sizes_and_chunk_remainder():
    seeds = np.zeros((13, 157), bool)
    seeds[4, 100] = True
    ours = np.asarray(edt(seeds, chunk=32))
    ref = _scipy_dist_to_seeds(seeds)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_banded_edt_matches_full_sweep(small_scene):
    from leafgrasp_tpu.ops.edt import squared_edt_full
    mask, _ = small_scene
    for seeds in (mask > 0, mask == 1, mask == 2, ~(mask == 3)):
        banded = np.asarray(squared_edt(seeds))
        full = np.asarray(squared_edt_full(seeds))
        np.testing.assert_array_equal(banded, full)


def test_banded_edt_sparse_and_empty(rng):
    from leafgrasp_tpu.ops.edt import squared_edt_full
    h, w = 64, 200
    # single far seed (stresses the band bound)
    seeds = np.zeros((h, w), bool)
    seeds[3, 190] = True
    np.testing.assert_array_equal(np.asarray(squared_edt(seeds)),
                                  np.asarray(squared_edt_full(seeds)))
    # no seeds at all: graceful degradation to the sentinel
    empty = np.zeros((h, w), bool)
    d2 = np.asarray(squared_edt(empty))
    assert np.isfinite(d2).all() and (d2 >= 64).all()
    # random sprinkles
    for seed in range(3):
        s = np.zeros((h, w), bool)
        pts = rng.integers(0, [h, w], size=(7, 2))
        s[pts[:, 0], pts[:, 1]] = True
        np.testing.assert_array_equal(np.asarray(squared_edt(s)),
                                      np.asarray(squared_edt_full(s)))


def test_edt_degenerate_shapes():
    from leafgrasp_tpu.ops.edt import squared_edt_full
    # width smaller than the chunk
    seeds = np.zeros((9, 40), bool)
    seeds[2, 5] = True
    np.testing.assert_array_equal(np.asarray(squared_edt(seeds)),
                                  np.asarray(squared_edt_full(seeds)))
    # all-True mask
    full = np.ones((16, 32), bool)
    assert np.asarray(squared_edt(full)).max() == 0
    # single row / single-ish column geometry
    row = np.zeros((1, 64), bool)
    row[0, 10] = True
    d2 = np.asarray(squared_edt(row))
    assert d2[0, 10] == 0 and d2[0, 13] == 9


# ---------------------------------------------------- FMM equivalence --

class TestFmmVsExactEdt:
    """Empirical check that replacing ``skfmm.distance``
    (leaf_scorer.py:69) with the exact EDT is consumer-safe (VERDICT r1
    item 8). scikit-fmm is not installable here (zero egress), so the
    oracle is tests/fmm_impl.py, a transcription of first-order fast
    marching for binary interfaces."""

    def _fields(self, seed, n=4):
        from leafgrasp_tpu.io.scenes import make_leaf_scene
        from leafgrasp_tpu.ops.edt import edt
        from tests.fmm_impl import fmm_distance
        mask, _ = make_leaf_scene(height=135, width=180, num_leaves=n,
                                  seed=seed, margin=20)
        fg = mask > 0
        return fg, np.asarray(edt(fg)), fmm_distance(fg)

    @pytest.mark.parametrize("seed", [0, 3, 8])
    def test_field_agreement(self, seed):
        """First-order FMM overshoots by <3% along diagonals and
        undershoots by at most 1 - sqrt(2)/2 ~= 0.293 px at concave
        seed corners (the continuum interface cuts cell-center
        corners); measured extremes on these frames are exactly that."""
        fg, d_edt, d_fmm = self._fields(seed)
        assert np.all(d_fmm >= d_edt - 0.30)
        err = d_fmm - d_edt
        far = d_edt > 10
        if far.any():
            assert np.max(np.abs(err[far]) / d_edt[far]) < 0.05
        np.testing.assert_array_equal(d_fmm == 0, d_edt == 0)

    @pytest.mark.parametrize("seed", [0, 3, 8])
    def test_extrema_and_clutter_consumers(self, seed):
        """What the leaf scorer consumes: argmin (first leaf pixel)
        and the argmax pixel -- identical on every golden frame."""
        fg, d_edt, d_fmm = self._fields(seed)
        # argmin tie-breaks identically: both fields are exactly 0 on
        # every leaf pixel and positive elsewhere
        assert np.argmin(d_edt) == np.argmin(d_fmm)
        if d_edt.max() == 0:      # foreground covers the frame
            return
        pmax_e = np.unravel_index(np.argmax(d_edt), d_edt.shape)
        pmax_f = np.unravel_index(np.argmax(d_fmm), d_fmm.shape)
        # the most-isolated pixel agrees to within the discretization
        # error ball: both points are near-max in BOTH fields
        assert d_edt[pmax_f] > 0.97 * d_edt[pmax_e]
        assert d_fmm[pmax_e] > 0.97 * d_fmm[pmax_f]

    @pytest.mark.parametrize("seed", [0, 3, 8, 11, 17])
    def test_leaf_choice_invariant(self, seed):
        """The selected leaf is identical whether clutter uses FMM or
        exact-EDT extrema (the only way skfmm reaches a decision)."""
        from leafgrasp_tpu.io.scenes import make_leaf_scene
        from leafgrasp_tpu.ops.edt import edt
        from tests.fmm_impl import fmm_distance
        from tests import reference_impl as ref
        mask, depth = make_leaf_scene(height=135, width=180,
                                      num_leaves=5, seed=seed, margin=20)
        fg = mask > 0
        if not fg.any():
            return
        choice = {}
        for name, field in (("edt", np.asarray(edt(fg))),
                            ("fmm", fmm_distance(fg))):
            pmin = np.unravel_index(np.argmin(field), field.shape)
            pmax = np.unravel_index(np.argmax(field), field.shape)
            best, best_score = None, -1.0
            for lid in np.unique(mask):
                if lid == 0 or (mask == lid).sum() < 400:
                    continue
                ys, xs = np.nonzero(mask == lid)
                c = (xs.mean(), ys.mean())
                dmin = np.hypot(c[0] - pmin[1], c[1] - pmin[0])
                dmax = np.hypot(c[0] - pmax[1], c[1] - pmax[0])
                s = dmin / (dmin + dmax) if dmin + dmax > 0 else 0.0
                if s > best_score:
                    best, best_score = lid, s
            choice[name] = best
        assert choice["edt"] == choice["fmm"]


# ---------------------------------------------------------------------------
# exact-extrema-without-field + windowed pass-2 (round 2 fps work)


class TestMaxArgmaxAndWindow:
    """edt_max_argmax(_batch) and squared_edt_window are exact vs the
    full sweep on adversarial layouts (constant fields, near-max
    plateaus, single pixels)."""

    def _cases(self):
        rng = np.random.default_rng(11)
        h, w = 83, 127
        yield np.zeros((h, w), bool)
        yield np.ones((h, w), bool)
        one = np.zeros((h, w), bool)
        one[40, 60] = True
        yield one                                  # radial plateau of ties
        edge = np.zeros((h, w), bool)
        edge[:, 0] = True
        yield edge                                 # max on the far column
        for p in (0.001, 0.05, 0.5):
            yield rng.random((h, w)) < p

    def test_max_argmax_exact(self):
        from leafgrasp_tpu.ops.edt import edt_max_argmax, squared_edt_full
        for seeds in self._cases():
            d = jnp.sqrt(squared_edt_full(jnp.asarray(seeds)))
            mx, am = edt_max_argmax(jnp.asarray(seeds))
            assert np.asarray(mx) == np.asarray(jnp.max(d))
            assert int(am) == int(jnp.argmax(d))

    def test_max_argmax_batch_matches_single(self):
        from leafgrasp_tpu.ops.edt import (edt_max_argmax_batch,
                                           nearest_seed_dist_1d,
                                           squared_edt_full)
        seeds = np.stack(list(self._cases())[:4])
        g = nearest_seed_dist_1d(jnp.asarray(seeds),
                                 axis=1).astype(jnp.float32)
        mx, am = edt_max_argmax_batch(g * g)
        for c in range(seeds.shape[0]):
            d = jnp.sqrt(squared_edt_full(jnp.asarray(seeds[c])))
            assert np.asarray(mx)[c] == np.asarray(jnp.max(d))
            assert int(np.asarray(am)[c]) == int(jnp.argmax(d))

    def test_tile_candidates_coverage_bound(self):
        """The tile-max selection's contract: every sample NOT in the
        returned candidate set is <= the reported bound (so the caller's
        'bound < m_low - slack' guard proves Lipschitz coverage)."""
        from leafgrasp_tpu.ops.edt import _tile_candidates
        rng = np.random.default_rng(3)
        ds = (rng.random((120, 41)) * 50).astype(np.float32)
        kth, flat, exhaustive = _tile_candidates(jnp.asarray(ds), 256)
        assert not exhaustive          # 15x6=90 tiles > 256/64=4
        sel = np.zeros(ds.size, bool)
        sel[np.asarray(flat)] = True
        kth = float(kth)
        assert ds.ravel()[~sel].max() <= kth + 1e-6
        assert sel[ds.ravel() > kth].all()

    def test_max_argmax_fallback_lane_large(self):
        """A near-constant dense-random field defeats the coverage
        guard at a size where tiles >> budget; the exact full-sweep
        fallback must preserve bit-equal max + first-occurrence
        argmax."""
        from leafgrasp_tpu.ops.edt import edt_max_argmax, squared_edt_full
        rng = np.random.default_rng(7)
        seeds = rng.random((210, 330)) < 0.5
        d = jnp.sqrt(squared_edt_full(jnp.asarray(seeds)))
        mx, am = edt_max_argmax(jnp.asarray(seeds))
        assert np.asarray(mx) == np.asarray(jnp.max(d))
        assert int(am) == int(jnp.argmax(d))

    def test_window_matches_full_block(self):
        from leafgrasp_tpu.ops.edt import (nearest_seed_dist_1d,
                                           squared_edt_full,
                                           squared_edt_window)
        rng = np.random.default_rng(5)
        h, w = 83, 127
        seeds = rng.random((h, w)) < 0.01
        g = nearest_seed_dist_1d(jnp.asarray(seeds),
                                 axis=0).astype(jnp.float32)
        g2 = g * g
        full = np.asarray(squared_edt_full(jnp.asarray(seeds)))
        for (r0, c0, hq, wq) in [(0, 0, 16, 16), (40, 90, 43, 37),
                                 (82, 126, 1, 1), (0, 0, 200, 200)]:
            hqc, wqc = min(hq, h), min(wq, w)
            r0c, c0c = min(r0, h - hqc), min(c0, w - wqc)
            blk = np.asarray(squared_edt_window(g2, r0c, c0c, hq, wq))
            np.testing.assert_array_equal(
                blk, full[r0c:r0c + hqc, c0c:c0c + wqc])

    def test_band_mask_exact_on_mask(self):
        from leafgrasp_tpu.ops.edt import squared_edt, squared_edt_full
        rng = np.random.default_rng(9)
        h, w = 83, 127
        seeds = rng.random((h, w)) < 0.005
        mask = np.zeros((h, w), bool)
        mask[30:60, 40:80] = True
        banded = np.asarray(squared_edt(jnp.asarray(seeds),
                                        band_mask=jnp.asarray(mask)))
        full = np.asarray(squared_edt_full(jnp.asarray(seeds)))
        np.testing.assert_array_equal(banded[mask], full[mask])
        assert np.all(banded >= full - 1e-6)       # overestimate off-mask


class TestWindowSrcBanded:
    """squared_edt_window_src is exact when every query's distance is
    below src_pad (1-Lipschitz winning-source argument)."""

    def test_matches_full_window_under_bound(self):
        rng = np.random.default_rng(5)
        h, w = 96, 400
        from leafgrasp_tpu.ops.edt import (nearest_seed_dist_1d,
                                           squared_edt_window,
                                           squared_edt_window_src)
        # seeds everywhere at moderate density -> distances well below
        # the pad; multi-channel stack
        seeds = rng.random((3, h, w)) < 0.01
        seeds[:, :, ::37] = True          # guarantee bound < 37
        g = nearest_seed_dist_1d(jnp.asarray(seeds), axis=1)
        g2 = (g * g).astype(jnp.float32)
        for r0, c0, hq, wq, pad in ((10, 40, 64, 128, 64),
                                    (0, 0, 96, 96, 48),
                                    (30, 272, 32, 128, 40)):
            full = np.asarray(squared_edt_window(g2, r0, c0, hq, wq))
            band = np.asarray(squared_edt_window_src(g2, r0, c0, hq, wq,
                                                     pad))
            assert np.max(full) < pad * pad, "fixture bound violated"
            np.testing.assert_array_equal(band, full)

    def test_scorer_band_flag_is_bit_exact(self):
        """compute_grasp_scores with leaf_window_src_pad on vs off:
        identical score maps on union-mode scenes (the scorer only uses
        the banded path when its proven bound fits)."""
        import dataclasses
        from leafgrasp_tpu.config import GraspScoringConfig
        from leafgrasp_tpu.geometry.grasp_scorer import compute_grasp_scores
        from leafgrasp_tpu.io.scenes import make_leaf_scene
        for seed, n in ((8, 6), (3, 12)):
            mask, depth = make_leaf_scene(270, 360, num_leaves=n,
                                          seed=seed, margin=40)
            lid = int(np.unique(mask)[1])
            base = GraspScoringConfig(isolation_context="union")
            banded = dataclasses.replace(base, leaf_window_src_pad=96)
            outs = []
            for cfg in (base, banded):
                s = compute_grasp_scores(
                    jnp.asarray(mask == lid), jnp.asarray(mask > 0),
                    jnp.asarray(depth), 180.0, 135.0, 800.0, cfg)
                outs.append(np.asarray(s.traditional_score))
            np.testing.assert_array_equal(outs[0], outs[1])
