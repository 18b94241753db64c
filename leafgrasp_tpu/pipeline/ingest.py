"""Host shell: the grasp-selection service around the jitted pipeline.

TPU-native equivalent of the production ROS node
(reference leaf_grasp_node_v3.py:25-243) and the VLA node
(leaf_grasp_node_vla.py:24-284):

* stream callbacks (`on_mask` / `on_depth`) feed the lock-free
  FrameBus (replacing the processing-flag + param-server handshake);
* `process_pending` pulls the freshest pair, rate-gates (10 Hz default,
  leaf_grasp_node_v3.py:81), runs the jitted frame function, publishes
  the reference's message tuple "u,v,X,Y,Z[,pX,pY,pZ]"
  (leaf_grasp_node_v3.py:170-177);
* optional VLA re-ranking over per-leaf candidates BEFORE pixel
  selection -- the reference's intended flow, with its broken
  `_calculate_all_scores` call (leaf_grasp_node_vla.py:148-182, see
  SURVEY.md 3.2) actually fixed: candidates come from the leaf
  selector's real per-leaf scores.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from leafgrasp_tpu.config import PipelineConfig, DEFAULT_CONFIG, \
    CameraConfig
from leafgrasp_tpu.io.framebus import FrameBus
from leafgrasp_tpu.pipeline.frame import make_frame_fn
from leafgrasp_tpu.utils.profiler import StageTimer

__all__ = ["GraspService", "format_result_message", "leaf_candidates",
           "compact_instance_ids"]


def compact_instance_ids(mask: np.ndarray, max_leaves: int):
    """Remap arbitrary instance ids (e.g. YOLO tracking ids) onto the
    jit-friendly 1..max_leaves slot range. Returns (remapped int32 mask,
    slot -> original-id lookup). Ids beyond max_leaves (by area rank,
    largest kept) are dropped to background."""
    mask = np.asarray(mask)
    ids, counts = np.unique(mask[mask > 0], return_counts=True)
    if len(ids) > max_leaves:
        keep = ids[np.argsort(-counts)][:max_leaves]
        keep = np.sort(keep)
    else:
        keep = ids
    out = np.zeros(mask.shape, np.int32)
    lookup = {}
    for slot, orig in enumerate(keep, start=1):
        out[mask == orig] = slot
        lookup[slot] = int(orig)
    return out, lookup


def format_result_message(grasp_uv, grasp_xyz, pre_grasp_xyz=None) -> str:
    """Reference publish format (leaf_grasp_node_v3.py:170-177)."""
    u, v = int(grasp_uv[0]), int(grasp_uv[1])
    x, y, z = (float(grasp_xyz[0]), float(grasp_xyz[1]),
               float(grasp_xyz[2]))
    if pre_grasp_xyz is None:
        return f"{u},{v},{x},{y},{z}"
    px, py, pz = (float(pre_grasp_xyz[0]), float(pre_grasp_xyz[1]),
                  float(pre_grasp_xyz[2]))
    return f"{u},{v},{x},{y},{z},{px},{py},{pz}"


def leaf_candidates(selection, max_candidates: int = 5) -> List[Dict]:
    """Build VLA candidates from the leaf selector's per-leaf scores
    (the working version of leaf_grasp_node_vla.py:148-182): one
    candidate per area-valid leaf, sorted by weighted geometric score,
    top-k kept."""
    scores = np.asarray(selection.scores)
    weighted = np.asarray(selection.weighted)
    valid = np.asarray(selection.candidate)
    cx = np.asarray(selection.stats.centroid_x)
    cy = np.asarray(selection.stats.centroid_y)

    cands = []
    for slot in np.where(valid)[0]:
        cands.append(dict(
            leaf_id=int(slot) + 1,
            x=float(cx[slot]), y=float(cy[slot]),
            clutter_score=float(scores[slot, 0]),
            distance_score=float(scores[slot, 1]),
            visibility_score=float(scores[slot, 2]),
            geometric_score=float(weighted[slot]),
        ))
    cands.sort(key=lambda c: -c["geometric_score"])
    return cands[:max_candidates]


class GraspService:
    """Frame-stream grasp selection service.

    Parameters
    ----------
    cfg : PipelineConfig
    cnn_variables : optional trained GraspPointCNN variables (enables
        CV+ML fusion; absent -> CV-only, mirroring the reference's
        missing-checkpoint degradation).
    hybrid_selector : optional vla.HybridGraspSelector for leaf-level
        VLA re-ranking; failures degrade to the geometric choice.
    publish : callback(str) for the result message.
    on_result : callback(FrameResult, dict) with the full result.
    spatial_mesh : optional jax.sharding.Mesh; when given, each frame is
        row-sharded over the mesh's ``data`` axis (single-frame latency
        scales with chips over ICI; see parallel/spatial_frame.py).
        Requires frame height % data-axis == 0 and an isolation mode
        other than ``union_half``.
    record_path : optional path; every processed (mask, depth, stamp)
        is appended to a native frame log (io/framelog.py) for replay.
    pipeline_depth : number of frames kept in flight on the device
        before results are fetched (0 = synchronous, the default).
        JAX dispatch is async, so depth N overlaps host work (ingest,
        publish, visualization) with device compute of the next frames
        -- single-chip throughput then matches pipelined dispatch
        (bench.py methodology) instead of serialize-per-frame. Results
        still publish in frame order, one frame late per depth; callers
        drain with ``flush()``. Composes with ``hybrid_selector``: the
        oldest in-flight frame's VLA rerank (a host-driven decode loop)
        runs AFTER the newest frame's grasp program is dispatched, so
        frame compute and the rerank's dispatch/fetch gaps overlap on
        the device instead of strictly serializing (the reference VLA
        node keeps processing while its VLA evaluates,
        leaf_grasp_node_vla.py:97-146). The rerank of frame N uses the
        freshest ``on_rgb`` image at completion time -- same
        latest-image semantics as the synchronous path.

        **Default guidance (measured, PERF.md "Combined VLA service"):
        with a hybrid_selector leave pipeline_depth=0.** The overlap
        A/B on the real chip measured 0.917x of serial: the next
        frame's ~9 MB ingest transfer streams under the rerank's
        RTT-bound dispatch chain and head-of-line-blocks it (probe:
        small round trips inflate 1.89x under a concurrent frame
        transfer), while the hideable frame compute is only ~1% of the
        rerank-dominated frame period. pipeline_depth > 0 is the
        single-chip throughput strategy for frame-only (no-VLA)
        pipelines.
    """

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG,
                 cnn_variables=None, hybrid_selector=None,
                 publish: Optional[Callable[[str], None]] = None,
                 on_result: Optional[Callable] = None,
                 min_interval_s: float = 0.1,
                 prefer_native_bus: bool = True,
                 spatial_mesh=None,
                 pipeline_depth: int = 0,
                 record_path: Optional[str] = None,
                 cnn_norm_stats=None):
        self.pipeline_depth = pipeline_depth
        self._inflight: List[tuple] = []
        self._recorder = None
        if record_path is not None:
            from leafgrasp_tpu.io.framelog import FrameLogWriter
            self._recorder = FrameLogWriter(record_path, cfg.frame.height,
                                            cfg.frame.width)
        self.cfg = cfg
        self.camera = cfg.camera
        self.cnn_variables = cnn_variables
        self.hybrid_selector = hybrid_selector
        self.publish = publish
        self.on_result = on_result
        self.min_interval_s = min_interval_s
        self.timer = StageTimer()

        self.bus = FrameBus(cfg.frame.height, cfg.frame.width,
                            prefer_native=prefer_native_bus)
        if spatial_mesh is not None:
            # row-shard each frame over the mesh's data axis (single-
            # frame latency scales with chips; parallel/spatial_frame.py)
            if (cnn_variables is not None
                    and cfg.fusion.patch_normalization == "train_stats"):
                raise ValueError(
                    "patch_normalization='train_stats' is not plumbed "
                    "through the row-sharded path; use the single-chip "
                    "frame fn or patch_normalization='reference_minmax'")
            from leafgrasp_tpu.parallel.spatial_frame import \
                make_sharded_frame_fn
            self._fn = make_sharded_frame_fn(
                spatial_mesh, cfg, with_cnn=cnn_variables is not None)
        else:
            # cnn_norm_stats: the checkpoint's stored stats dict for the
            # corrected train-consistent serving normalization
            # (cfg.fusion.patch_normalization == 'train_stats'; see
            # geometry/patches.py)
            self._fn = make_frame_fn(cfg,
                                     with_cnn=cnn_variables is not None,
                                     norm_stats=cnn_norm_stats)
        self._last_processed = 0.0
        self._latest_rgb = None
        self._frames = 0
        self._stop = threading.Event()
        # serializes frame processing against stop()/flush() from
        # another thread (the documented run()-in-a-thread usage):
        # _inflight and the recorder are shared. RLock because stop()
        # drains via flush().
        self._proc_lock = threading.RLock()

    # ------------------------------------------------------- callbacks --

    def set_camera_params(self, projection_matrix):
        """3x4 P matrix (leaf_grasp_node_v3.py:93-99)."""
        self.camera = CameraConfig.from_projection(
            np.asarray(projection_matrix))

    def on_mask(self, mask: np.ndarray, stamp_us: int = 0):
        self.bus.push_mask(mask, stamp_us)

    def on_depth(self, depth: np.ndarray, stamp_us: int = 0):
        self.bus.push_depth(depth, stamp_us)

    def on_rgb(self, image: np.ndarray):
        """Left rectified color image, used by VLA re-ranking and the
        visualizer (leaf_grasp_node_v3.py:220-225)."""
        self._latest_rgb = image

    # ------------------------------------------------------ processing --

    def process_pending(self, force: bool = False):
        """Process the freshest pair if the rate gate allows. Returns the
        result dict or None."""
        now = time.monotonic()
        if not force and (now - self._last_processed) < self.min_interval_s:
            return None
        pair = self.bus.try_get_pair()
        if pair is None:
            return None
        mask, depth, mask_stamp, depth_stamp = pair
        self._last_processed = now
        return self.process_frame(mask, depth, mask_stamp=mask_stamp,
                                  depth_stamp=depth_stamp)

    def process_frame(self, mask: np.ndarray, depth: np.ndarray,
                      mask_stamp: int = 0, depth_stamp: int = 0):
        with self._proc_lock:
            return self._process_frame_locked(mask, depth, mask_stamp,
                                              depth_stamp)

    def _process_frame_locked(self, mask, depth, mask_stamp, depth_stamp):
        cam = self.camera
        # ship the mask as int16 (the wire format) -- the jitted pipeline
        # upcasts on device; halves the mask's host->HBM transfer
        mask16 = np.ascontiguousarray(mask, np.int16)
        if self._recorder is not None:
            # session recording (framelog replaces the reference's loose
            # PNG/.npy dumps); replay with io.framelog.FrameLogReader
            self._recorder.append(mask16, depth, mask_stamp)
        with self.timer.stage("frame_total"):
            with self.timer.stage("select_grasp"):
                if self.cnn_variables is not None:
                    res = self._fn(mask16, depth,
                                   np.float32(cam.cx), np.float32(cam.cy),
                                   np.float32(cam.fx), self.cnn_variables)
                else:
                    res = self._fn(mask16, depth,
                                   np.float32(cam.cx), np.float32(cam.cy),
                                   np.float32(cam.fx))

            idx = self._frames
            self._frames += 1
            entry = (res, mask16, depth, mask_stamp, depth_stamp, idx)
            if self.pipeline_depth:
                # async dispatch: `res` is an unmaterialized device
                # future; complete the oldest in-flight frame once the
                # window is full (device computes the new frame while
                # the host publishes -- and, with a hybrid_selector,
                # reranks -- the old one)
                self._inflight.append(entry)
                if len(self._inflight) > self.pipeline_depth:
                    return self._complete(*self._inflight.pop(0))
                return None
            return self._complete(*entry)

    def _complete(self, res, mask16, depth, mask_stamp, depth_stamp,
                  frame_index):
        """Materialize a dispatched frame: VLA rerank (when configured)
        then host-side finalize/publish."""
        # ONE device fetch for the whole result pytree: the consumers
        # below (found/leaf_id/candidate fields/uv/xyz/degenerate) each
        # cost a ~27 ms round trip on the tunnelled backend if fetched
        # lazily -- ~11 RTTs ~= 300 ms/frame, measured as the largest
        # overhead in the r4 VLA-service bench stage split
        import jax
        res = jax.device_get(res)
        vla_choice = None
        if self.hybrid_selector is not None and bool(res.found):
            with self.timer.stage("vla_rerank"):
                vla_choice = self._vla_rerank(res, mask16, depth)
            if vla_choice is not None and \
                    vla_choice["leaf_id"] != int(res.leaf_id):
                # re-run pixel selection on the VLA-chosen leaf
                with self.timer.stage("vla_reselect"):
                    res = jax.device_get(
                        self._reselect(mask16, depth,
                                       vla_choice["leaf_id"]))
        return self._finalize(res, mask_stamp, depth_stamp, frame_index,
                              vla_choice)

    def _finalize(self, res, mask_stamp, depth_stamp, frame_index,
                  vla_choice=None):
        """Materialize a frame result and publish it (host side)."""
        with self.timer.stage("finalize"):
            found = bool(res.found)
            msg = None
            if found:
                msg = format_result_message(np.asarray(res.grasp_uv),
                                            np.asarray(res.grasp_xyz),
                                            np.asarray(res.pre_grasp_xyz))
                if self.publish:
                    self.publish(msg)
            out = dict(result=res, message=msg, found=found,
                       degenerate=bool(res.degenerate), vla=vla_choice,
                       mask_stamp=mask_stamp, depth_stamp=depth_stamp,
                       frame_index=frame_index)
            if self.on_result:
                self.on_result(out)
        return out

    def flush(self) -> List[dict]:
        """Finalize every in-flight frame (pipeline_depth > 0), in
        frame order. Returns their result dicts."""
        with self._proc_lock:
            outs = []
            while self._inflight:
                outs.append(self._complete(*self._inflight.pop(0)))
            return outs

    def _vla_rerank(self, res, mask, depth):
        try:
            cands = leaf_candidates(res.leaf_selection,
                                    self.cfg.vla.num_candidates)
            if not cands:
                return None
            return self.hybrid_selector.select_grasp_point(
                self._latest_rgb, cands)
        except Exception:
            return None  # geometric fallback (leaf_grasp_node_vla.py:133)

    def _reselect(self, mask, depth, leaf_id: int):
        """Pixel selection constrained to a specific leaf id."""
        # reuse select_grasp with a remapped mask: keep only this leaf.
        # int16 matters: it is the wire dtype the main path ships
        # (_process_frame_locked), so the SAME compiled frame program
        # serves both -- an int32 mask here jitted a second full frame
        # program (~40 s through the tunnel) on the first VLA
        # disagreement (caught by the r4 service bench's stage split)
        remapped = np.where(mask == leaf_id, leaf_id, 0).astype(np.int16)
        cam = self.camera
        if self.cnn_variables is not None:
            return self._fn(remapped, depth, np.float32(cam.cx),
                            np.float32(cam.cy), np.float32(cam.fx),
                            self.cnn_variables)
        return self._fn(remapped, depth, np.float32(cam.cx),
                        np.float32(cam.cy), np.float32(cam.fx))

    # ------------------------------------------------------------ loop --

    def run(self, poll_interval_s: float = 0.005):
        """Blocking service loop; stop with .stop()."""
        while not self._stop.is_set():
            out = self.process_pending()
            if out is None:
                time.sleep(poll_interval_s)

    def stop(self):
        self._stop.set()
        # drain dispatched-but-unfinalized frames (pipeline_depth > 0) so
        # their results publish and reach the recorder before it closes;
        # the lock serializes against a run() loop mid-frame in another
        # thread (its in-progress frame completes and records first)
        with self._proc_lock:
            self.flush()
            if self._recorder is not None:
                self._recorder.close()
                self._recorder = None

    def stats(self) -> dict:
        return dict(bus=self.bus.stats(), frames=self._frames,
                    stages=self.timer.summary())
