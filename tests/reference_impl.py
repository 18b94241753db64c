"""Loop-based numpy oracle of the reference algorithms, for parity tests.

Transparent, unvectorized re-implementations of the reference math
(cited per function) used to verify the TPU-native vectorized versions.
Two EDT modes:
  * "exact"  -- scipy exact EDT (what leafgrasp_tpu computes);
  * "cv2"    -- OpenCV chamfer masks exactly as the reference calls them,
                to check argmax-level (grasp pixel / leaf id) parity
                despite the documented EDT divergence.
"""

from __future__ import annotations

import numpy as np
import cv2
import scipy.ndimage as ndi


def dist_to_zero(mask_u8, mode="exact", mask_size=5):
    """cv2.distanceTransform semantics: distance of nonzero px to nearest
    zero px."""
    if mode == "exact":
        return ndi.distance_transform_edt(mask_u8 > 0).astype(np.float32)
    return cv2.distanceTransform(mask_u8.astype(np.uint8), cv2.DIST_L2,
                                 mask_size)


# ------------------------------------------------------------------ leaf --

def select_leaf_reference(mask, depth, cx, cy, f, min_area=10000,
                          mode="exact"):
    """reference leaf_scorer.py:25-199 as a plain loop."""
    leaf_ids = sorted(int(i) for i in np.unique(mask) if i != 0)
    if not leaf_ids:
        return None, {}

    medians = {lid: np.median(depth[mask == lid]) for lid in leaf_ids}
    depth_mean = np.mean(list(medians.values()))
    tall = {lid for lid in leaf_ids if medians[lid] < depth_mean}

    # global SDF of the background (leaf_scorer.py:66-71): 0 on leaves,
    # distance of background pixels to nearest leaf pixel.
    if mode == "exact":
        global_sdf = ndi.distance_transform_edt(mask == 0).astype(np.float32)
    else:
        global_sdf = cv2.distanceTransform((mask == 0).astype(np.uint8),
                                           cv2.DIST_L2, 5)
    mn = np.unravel_index(global_sdf.argmin(), global_sdf.shape)
    mx = np.unravel_index(global_sdf.argmax(), global_sdf.shape)

    h, w = mask.shape
    candidates = []
    for lid in leaf_ids:
        m = mask == lid
        if m.sum() < min_area:
            continue
        ys, xs = np.where(m)
        cent = (xs.mean(), ys.mean())
        d_min = np.hypot(cent[0] - mn[1], cent[1] - mn[0])
        d_max = np.hypot(cent[0] - mx[1], cent[1] - mx[0])
        clutter = d_min / (d_min + d_max) if (d_min + d_max) > 0 else 0.0

        md = depth[m].mean()
        X = md * (xs - cx) / f
        Y = md * (ys - cy) / f
        mean_dist = np.sqrt(X ** 2 + Y ** 2 + md ** 2).mean()
        dist_score = np.exp(-mean_dist / 0.3)

        border = (m[0, :].sum() + m[-1, :].sum() + m[:, 0].sum()
                  + m[:, -1].sum())
        if border > 0:
            vis = 0.0
        else:
            dc = np.hypot(cent[0] - w / 2, cent[1] - h / 2)
            vis = 1.0 - dc / np.hypot(w / 2, h / 2)
        candidates.append(dict(lid=lid, s=np.array([clutter, dist_score,
                                                    vis]),
                               tall=lid in tall))
    if not candidates:
        return None, {}

    group = [c for c in candidates if c["tall"]] or \
        [c for c in candidates if not c["tall"]]
    S = np.stack([c["s"] for c in group])
    front = _pareto(S)
    pareto_c = [c for i, c in enumerate(group) if front[i]] or group
    wts = np.array([0.35, 0.35, 0.3])
    best = max(pareto_c, key=lambda c: float(wts @ c["s"]))
    return best["lid"], {c["lid"]: c for c in candidates}


def _pareto(s):
    k = len(s)
    out = np.ones(k, bool)
    for i in range(k):
        for j in range(k):
            if i != j and (s[j] >= s[i]).all() and (s[j] > s[i]).any():
                out[i] = False
                break
    return out


# ----------------------------------------------------------------- grasp --

def min_area_rect_angle_cv2(leaf_mask):
    """The reference's orientation source: cv2.minAreaRect of the
    largest external contour (grasp_point_selector.py:718-752),
    normalized to the major-axis direction in radians."""
    m8 = np.asarray(leaf_mask, np.uint8)
    contours, _ = cv2.findContours(m8, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    contour = max(contours, key=cv2.contourArea)
    rect = cv2.minAreaRect(contour)
    size, angle = rect[1], rect[2]
    if size[0] < size[1]:
        angle = angle + 90
    return float(np.deg2rad(angle))


def grasp_scores_reference(leaf_mask, all_mask, depth, cx, cy, f,
                           mode="exact", angle="min_area_rect"):
    """reference grasp_point_selector.py:256-288,502-701 as plain numpy.

    `angle`: major-axis direction (radians) for the sdf alignment term.
    Default "min_area_rect" computes it the way the reference does
    (cv2.minAreaRect of the largest contour,
    grasp_point_selector.py:553-558); pass "pca" for the moment-PCA
    estimate (the leafgrasp_tpu orientation_source="pca" option), or a
    float to pin it (e.g. the framework's own sweep angle for bit-level
    downstream comparisons).
    """
    m8 = leaf_mask.astype(np.uint8)
    h, w = leaf_mask.shape
    if angle == "min_area_rect":
        # empty-mask fallback angle is arbitrary: every consumer is
        # masked by the (empty) leaf
        angle = min_area_rect_angle_cv2(leaf_mask) or 0.0
    elif angle == "pca":
        angle = None
    ys_g, xs_g = np.indices((h, w)).astype(np.float64)

    # sdf_score
    din = dist_to_zero(m8, mode)
    dout = dist_to_zero(1 - m8, mode)
    sdf = din - dout
    interior = np.exp(-((din - 20.0) ** 2) / (2 * 20.0 ** 2))
    sdf = sdf / np.max(np.abs(sdf))
    vx = xs_g - cx
    vy = ys_g - cy
    n = np.hypot(vx, vy)
    n[n == 0] = 1
    vx, vy = vx / n, vy / n
    if angle is None:
        yy, xx = np.where(leaf_mask)
        mux, muy = xx.mean(), yy.mean()
        cxx = ((xx - mux) ** 2).mean()
        cyy = ((yy - muy) ** 2).mean()
        cxy = ((xx - mux) * (yy - muy)).mean()
        angle = 0.5 * np.arctan2(2 * cxy, cxx - cyy)
    align = np.abs(vx * np.sin(angle) - vy * np.cos(angle))
    sdf_score = (0.4 * interior + 0.4 * align + 0.2 * sdf) * leaf_mask

    # approach
    norm3 = np.sqrt((xs_g - cx) ** 2 + (ys_g - cy) ** 2 + f ** 2)
    approach = (f / norm3) * leaf_mask

    # flatness: gaussian smooth + sobel on masked depth (torch conv path)
    import torch
    import torch.nn.functional as F
    from leafgrasp_tpu.ops.conv import gaussian_kernel, SOBEL_X, SOBEL_Y
    dm = torch.tensor((depth * leaf_mask).astype(np.float32))[None, None]
    g = torch.tensor(gaussian_kernel(5))[None, None]
    sm = F.conv2d(F.pad(dm, (2, 2, 2, 2), mode="reflect"), g)
    dx = F.conv2d(F.pad(sm, (1, 1, 1, 1), mode="reflect"),
                  torch.tensor(SOBEL_X)[None, None])
    dy = F.conv2d(F.pad(sm, (1, 1, 1, 1), mode="reflect"),
                  torch.tensor(SOBEL_Y)[None, None])
    flat = torch.exp(-torch.sqrt(dx ** 2 + dy ** 2) * 5).squeeze().numpy()

    # isolation
    other = (all_mask & ~leaf_mask).astype(np.uint8)
    iso = np.zeros((h, w), np.float32)
    for ksz, wgt in ((30, 0.7), (40, 0.3)):
        kk = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksz, ksz))
        inter = cv2.dilate(other, kk)
        if mode == "exact":
            dist = ndi.distance_transform_edt(1 - inter).astype(np.float32)
        else:
            dist = cv2.distanceTransform((1 - inter).astype(np.uint8),
                                         cv2.DIST_L2, 3)
        iso += wgt * dist / (dist.max() + 1e-6)
    pref = np.linspace(1.0, 0.2, h)[:, None]
    isolation = iso * np.tile(pref, (1, w)) * m8

    # distance / accessibility / stem
    distance = dist_to_zero(m8, mode)
    r = np.hypot(xs_g - cx, ys_g - cy)
    access = (0.7 * (1 - r / np.hypot(w, h))
              + 0.3 * np.cos(np.arctan2(ys_g - cy, xs_g - cx))) * m8
    bottom = np.zeros_like(m8)
    bottom[-(h // 3):, :] = 1
    kk = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (30, 30))
    stem = (cv2.dilate(m8 & bottom, kk) & m8).astype(np.float32)

    traditional = (0.4 * approach + 0.3 * sdf_score + 0.2 * flat
                   + 0.1 * access) * (1 - stem)
    valid = (distance > 20) & (m8 > 0) & (stem < 0.8)
    return dict(sdf_score=sdf_score, approach_score=approach,
                flatness_map=flat, isolation_map=isolation,
                distance_map=distance, accessibility_map=access,
                stem_penalty=stem, traditional_score=traditional,
                valid_region=valid)


def detect_midrib_reference(leaf_mask, raw_image):
    """cv2 transcription of reference grasp_point_selector.py:829-922:
    CLAHE-enhanced intensity ridge sampled perpendicular to the
    minAreaRect major axis. Returns (start_xy, end_xy) or None."""
    m8 = np.asarray(leaf_mask, np.uint8)
    img = np.asarray(raw_image)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    leaf_region = cv2.bitwise_and(img, img, mask=m8)
    gray = cv2.cvtColor(leaf_region, cv2.COLOR_BGR2GRAY)
    clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
    enhanced = clahe.apply(gray)

    contours, _ = cv2.findContours(m8, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    contour = max(contours, key=cv2.contourArea)
    rect = cv2.minAreaRect(contour)
    center, size, angle = rect[0], rect[1], rect[2]
    if size[0] < size[1]:
        angle = angle + 90
    angle = np.deg2rad(angle)
    major_axis = max(size[0], size[1])
    minor_axis = min(size[0], size[1])

    center = (int(center[0]), int(center[1]))
    dx = int(major_axis / 2 * np.cos(angle))
    dy = int(major_axis / 2 * np.sin(angle))
    mask_width = int(minor_axis / 6)
    window_width = mask_width
    pts = []
    h, w = m8.shape
    for t in np.linspace(0, 1, 20):
        x = int(center[0] - dx + 2 * dx * t)
        y = int(center[1] - dy + 2 * dy * t)
        if not (0 <= x < w and 0 <= y < h):
            continue
        n = np.sqrt(dx * dx + dy * dy)
        perp_dx = -dy / n * window_width
        perp_dy = dx / n * window_width
        intensities, positions = [], []
        for s in np.linspace(-1, 1, window_width):
            sx, sy = int(x + s * perp_dx), int(y + s * perp_dy)
            if 0 <= sx < w and 0 <= sy < h and m8[sy, sx]:
                intensities.append(enhanced[sy, sx])
                positions.append((sx, sy))
        if intensities:
            pts.append(positions[int(np.argmax(intensities))])
    if len(pts) < 2:
        return None
    return tuple(pts[0]), tuple(pts[-1])
