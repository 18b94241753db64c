"""Host shell tests: framebus (native + fallback), GraspService,
visualizer, QA tools, profiler."""

import threading

import numpy as np
import pytest

from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                  LeafSelectionConfig)
from leafgrasp_tpu.io.framebus import FrameBus, native_available
from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.io.tools import detect_midrib, angle_error, \
    quantify_angles
from leafgrasp_tpu.pipeline.ingest import (GraspService,
                                           format_result_message,
                                           leaf_candidates)
from leafgrasp_tpu.pipeline.visualizer import LeafVisualizer, \
    generate_color
from leafgrasp_tpu.utils.profiler import StageTimer

H, W = 270, 360
CFG = PipelineConfig(
    frame=FrameConfig(height=H, width=W, max_leaves=8),
    leaf=LeafSelectionConfig(min_leaf_area=1500),
)


def _scene():
    return make_leaf_scene(height=H, width=W, num_leaves=4, seed=3,
                           margin=40)


# --------------------------------------------------------------- framebus --

@pytest.mark.parametrize("prefer_native", [True, False])
def test_framebus_pairing(prefer_native):
    bus = FrameBus(4, 5, prefer_native=prefer_native)
    assert bus.try_get_pair() is None
    mask = np.arange(20, dtype=np.int16).reshape(4, 5)
    depth = np.linspace(0, 1, 20, dtype=np.float32).reshape(4, 5)
    bus.push_mask(mask, 111)
    assert bus.try_get_pair() is None     # no depth yet
    bus.push_depth(depth, 222)
    m, d, ms, ds = bus.try_get_pair()
    np.testing.assert_array_equal(m, mask)
    np.testing.assert_array_equal(d, depth)
    assert (ms, ds) == (111, 222)
    assert bus.try_get_pair() is None     # consumed
    bus.close()


def test_framebus_native_built():
    assert native_available(), "native framebus failed to build"
    bus = FrameBus(4, 5)
    assert bus.is_native
    bus.close()


def test_framebus_latest_wins_and_drops():
    bus = FrameBus(2, 2)
    for i in range(5):
        bus.push_mask(np.full((2, 2), i, np.int16), i)
    bus.push_depth(np.zeros((2, 2), np.float32), 9)
    m, d, ms, ds = bus.try_get_pair()
    assert m[0, 0] == 4 and ms == 4       # freshest mask won
    stats = bus.stats()
    assert stats["mask_pushed"] == 5
    assert stats["mask_dropped"] == 4
    assert stats["pairs"] == 1
    bus.close()


def test_framebus_threaded_stress():
    bus = FrameBus(8, 8)
    n = 300
    stop = threading.Event()

    def producer():
        for i in range(n):
            bus.push_mask(np.full((8, 8), i % 100, np.int16), i)
            bus.push_depth(np.full((8, 8), 0.5, np.float32), i)
        stop.set()

    got = []
    t = threading.Thread(target=producer)
    t.start()
    # consume ONLY in the body: a try_get_pair() in the loop condition
    # would swallow pairs without recording them (flaked on the 1-core
    # box where the producer finishes before the first iteration)
    while True:
        pair = bus.try_get_pair()
        if pair is None:
            if stop.is_set():
                break
            continue
        m = pair[0]
        assert (m == m[0, 0]).all()   # no torn frames
        got.append(int(m[0, 0]))
    t.join()
    s = bus.stats()
    assert s["mask_pushed"] == n
    assert s["pairs"] == len(got) > 0
    bus.close()


# ----------------------------------------------------------- grasp service --

def test_grasp_service_end_to_end():
    mask, depth = _scene()
    messages = []
    svc = GraspService(CFG, publish=messages.append, min_interval_s=0.0)
    svc.on_mask(mask)
    svc.on_depth(depth)
    out = svc.process_pending(force=True)
    assert out is not None and out["found"]
    parts = out["message"].split(",")
    assert len(parts) == 8                # u,v + 3D grasp + 3D pre-grasp
    u, v = int(parts[0]), int(parts[1])
    assert mask[v, u] == int(out["result"].leaf_id)
    assert messages == [out["message"]]
    stats = svc.stats()
    assert stats["frames"] == 1
    assert "frame_total" in stats["stages"]


def test_grasp_service_rate_gate():
    mask, depth = _scene()
    svc = GraspService(CFG, min_interval_s=1e6)
    svc.on_mask(mask)
    svc.on_depth(depth)
    svc.process_pending(force=True)
    svc.on_mask(mask)
    svc.on_depth(depth)
    assert svc.process_pending() is None  # gated


def test_grasp_service_vla_rerank():
    from leafgrasp_tpu.vla import HybridGraspSelector, VLAProcessor, \
        HeuristicScorer
    mask, depth = _scene()
    svc = GraspService(
        CFG, hybrid_selector=HybridGraspSelector(
            VLAProcessor(HeuristicScorer())),
        min_interval_s=0.0)
    svc.on_mask(mask)
    svc.on_depth(depth)
    out = svc.process_pending(force=True)
    assert out is not None and out["found"]
    assert out["vla"] is not None
    assert "strategy" in out["vla"]


def test_leaf_candidates_shape():
    mask, depth = _scene()
    svc = GraspService(CFG, min_interval_s=0.0)
    out = svc.process_frame(mask, depth)
    cands = leaf_candidates(out["result"].leaf_selection, 5)
    assert 1 <= len(cands) <= 5
    assert all(c["geometric_score"] >= cands[-1]["geometric_score"]
               for c in cands)
    for key in ("x", "y", "clutter_score", "distance_score",
                "visibility_score", "leaf_id"):
        assert key in cands[0]


def test_format_result_message():
    msg = format_result_message((10, 20), (0.1, 0.2, 0.5))
    assert msg.startswith("10,20,")
    assert len(msg.split(",")) == 5


# --------------------------------------------------------------- visualizer --

def test_visualizer_renders_and_saves(tmp_path):
    mask, depth = _scene()
    vis = LeafVisualizer(str(tmp_path))
    frame = vis.render(mask, selected_leaf=3, grasp_uv=(150, 120),
                       grasp_xyz=(0.1, 0.05, 0.5),
                       pre_grasp_xyz=(0.05, 0.02, 0.5),
                       tall_leaves=[1])
    assert frame.shape == (H, W, 3)
    # selected leaf painted red-ish, tall painted blue-ish
    sel_px = frame[mask == 3]
    assert (sel_px[:, 0] > sel_px[:, 2]).mean() > 0.8
    path = vis.visualize_result(mask, 3, (150, 120), (0.1, 0.05, 0.5),
                                (0.05, 0.02, 0.5), tall_leaves=[1])
    import os
    assert os.path.exists(path)
    # composite with rgb doubles the width
    rgb = np.zeros((H, W, 3), np.uint8)
    comp = vis.render(mask, 3, rgb=rgb)
    assert comp.shape == (H, 2 * W, 3)


def test_generate_color_distinct():
    colors = {generate_color(i) for i in range(1, 12)}
    assert len(colors) == 11


# --------------------------------------------------------------- QA tools --

def test_detect_midrib_on_synthetic_leaf():
    h, w = 200, 300
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    theta = 0.4
    ct, st = np.cos(theta), np.sin(theta)
    xr = (xx - 150) * ct + (yy - 100) * st
    yr = -(xx - 150) * st + (yy - 100) * ct
    mask = (xr / 80) ** 2 + (yr / 30) ** 2 <= 1
    # bright ridge along the major axis
    img = np.zeros((h, w), np.float32)
    img[mask] = 0.3
    img[mask & (np.abs(yr) < 2)] = 1.0
    out = detect_midrib(mask, img)
    assert out is not None
    (x1, y1), (x2, y2) = out
    ang = np.degrees(np.arctan2(y2 - y1, x2 - x1)) % 180
    assert abs(ang - np.degrees(theta)) < 8


def test_angle_error_and_quantify():
    h, w = 100, 150
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((xx - 75) / 40) ** 2 + ((yy - 50) / 15) ** 2 <= 1
    r = angle_error(mask, ((35, 50), (115, 50)))  # horizontal line
    assert r["error_deg"] < 3
    batch = quantify_angles(mask.astype(np.int16), {1: ((35, 50),
                                                        (115, 50))})
    assert batch[0]["leaf_id"] == 1


def test_angle_quantifier_shell_headless_session():
    """The click-to-annotate shell's session loop (the reference's
    interactive quantifier, leaf_angle_quantifier.py:36-78): leaf
    resolved at the click midpoint, off-leaf clicks skipped, palette
    view covers every leaf."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "angle_quantifier_shell",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools",
            "angle_quantifier_shell.py"))
    shell = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(shell)

    h, w = 100, 150
    yy, xx = np.mgrid[0:h, 0:w]
    mask = np.zeros((h, w), np.int16)
    mask[((xx - 75) / 40) ** 2 + ((yy - 30) / 12) ** 2 <= 1] = 3
    mask[((xx - 75) / 40) ** 2 + ((yy - 70) / 12) ** 2 <= 1] = 7
    rows = shell.session(mask, [((35, 30), (115, 30)),   # leaf id 3
                                ((35, 70), (115, 70)),   # leaf id 7
                                ((0, 0), (2, 2))])       # background
    assert [r["leaf_id"] for r in rows] == [3, 7, 0]
    assert rows[0]["valid"] and rows[0]["error_deg"] < 3
    assert rows[1]["valid"] and rows[1]["error_deg"] < 3
    assert not rows[2]["valid"]
    view = shell.mask_view(mask)
    assert view.shape == (h, w, 3)
    assert (view[mask == 3] != view[mask == 7]).any()
    assert (view[mask == 0] == 0).all()


# ---------------------------------------------------------------- profiler --

def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    t.record("a", 0.01)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert "a" in t.report()


# ------------------------------------------------------------ device utils --

def test_device_utils():
    from leafgrasp_tpu.utils.device import (device_info, to_device,
                                            clear_memory, live_buffer_bytes)
    info = device_info()
    assert info["device_count"] >= 1
    arr = to_device(np.ones((4, 4)))
    assert np.asarray(arr).sum() == 16
    assert live_buffer_bytes() >= 0
    clear_memory()


def test_online_train_preset():
    from leafgrasp_tpu.config import ONLINE_TRAIN_CONFIG
    assert ONLINE_TRAIN_CONFIG.pos_weight == 1.5
    assert ONLINE_TRAIN_CONFIG.batch_size == 8
    assert ONLINE_TRAIN_CONFIG.learning_rate == 1e-3


def test_compact_instance_ids():
    from leafgrasp_tpu.pipeline.ingest import compact_instance_ids
    mask = np.zeros((20, 20), np.int32)
    mask[0:5, 0:5] = 37          # 25 px
    mask[10:20, 10:20] = 1042    # 100 px
    mask[0:2, 10:12] = 7         # 4 px
    out, lookup = compact_instance_ids(mask, max_leaves=2)
    # largest two kept, slots ordered by original id
    assert set(lookup.values()) == {37, 1042}
    assert set(np.unique(out)) <= {0, 1, 2}
    for slot, orig in lookup.items():
        assert ((out == slot) == (mask == orig)).all()
    # small id 7 dropped to background
    assert (out[mask == 7] == 0).all()


def test_grasp_service_threaded_loop():
    import time
    mask, depth = _scene()
    results = []
    svc = GraspService(CFG, on_result=results.append, min_interval_s=0.0)
    t = threading.Thread(target=svc.run, kwargs=dict(poll_interval_s=0.001))
    t.start()
    try:
        for i in range(3):
            svc.on_mask(mask, stamp_us=i)
            svc.on_depth(depth, stamp_us=i)
            deadline = time.time() + 30
            while len(results) <= i and time.time() < deadline:
                time.sleep(0.01)
    finally:
        svc.stop()
        t.join(timeout=10)
    assert not t.is_alive()
    assert len(results) >= 3
    assert all(r["found"] for r in results[:3])


def test_grasp_service_spatial_mesh():
    """GraspService(spatial_mesh=...) row-shards each frame and must
    produce the same message as the single-device service."""
    from leafgrasp_tpu.parallel.mesh import make_mesh
    cfg = PipelineConfig(
        frame=FrameConfig(height=264, width=360, max_leaves=8),
        leaf=LeafSelectionConfig(min_leaf_area=1500))
    mask, depth = make_leaf_scene(height=264, width=360, num_leaves=4,
                                  seed=3, margin=40)
    mesh = make_mesh(8, model_axis=1)
    svc_sh = GraspService(cfg, min_interval_s=0.0, spatial_mesh=mesh)
    svc_un = GraspService(cfg, min_interval_s=0.0)
    outs = []
    for svc in (svc_sh, svc_un):
        svc.on_mask(mask)
        svc.on_depth(depth)
        outs.append(svc.process_pending(force=True))
    assert outs[0] is not None and outs[0]["found"]
    assert outs[0]["message"] == outs[1]["message"]


def test_grasp_service_pipelined_dispatch():
    """pipeline_depth=2: results trail dispatch by two frames, publish
    in frame order, and flush() drains the window; messages match the
    synchronous service."""
    mask, depth = _scene()
    frames = [(np.roll(mask, i, axis=1), np.roll(depth, i, axis=1))
              for i in range(4)]

    sync_msgs = []
    svc_sync = GraspService(CFG, publish=sync_msgs.append,
                            min_interval_s=0.0)
    for m, d in frames:
        svc_sync.process_frame(m, d)

    msgs = []
    results = []
    svc = GraspService(CFG, publish=msgs.append, on_result=results.append,
                       min_interval_s=0.0, pipeline_depth=2)
    outs = [svc.process_frame(m, d) for m, d in frames]
    assert outs[0] is None and outs[1] is None          # window filling
    assert outs[2]["frame_index"] == 0
    assert outs[3]["frame_index"] == 1
    tail = svc.flush()
    assert [t["frame_index"] for t in tail] == [2, 3]
    assert not svc._inflight
    assert [r["frame_index"] for r in results] == [0, 1, 2, 3]
    assert msgs == sync_msgs


def test_grasp_service_pipelined_vla_rerank():
    """pipeline_depth composes with hybrid_selector (VERDICT r3 item
    2): the oldest frame's rerank runs after the newest dispatch, in
    frame order, with messages identical to the synchronous hybrid
    service."""
    from leafgrasp_tpu.vla import HybridGraspSelector, VLAProcessor, \
        HeuristicScorer

    def make(depth_n, msgs):
        return GraspService(
            CFG, hybrid_selector=HybridGraspSelector(
                VLAProcessor(HeuristicScorer())),
            publish=msgs.append, min_interval_s=0.0,
            pipeline_depth=depth_n)

    mask, depth = _scene()
    frames = [(np.roll(mask, i, axis=1), np.roll(depth, i, axis=1))
              for i in range(4)]
    rgb = np.zeros((H, W, 3), np.uint8)

    sync_msgs, sync_vla = [], []
    svc_sync = make(0, sync_msgs)
    svc_sync.on_rgb(rgb)
    for m, d in frames:
        out = svc_sync.process_frame(m, d)
        sync_vla.append(out["vla"])
    assert all(v is not None for v in sync_vla)

    msgs, results = [], []
    svc = make(2, msgs)
    svc.on_rgb(rgb)
    outs = [svc.process_frame(m, d) for m, d in frames]
    assert outs[0] is None and outs[1] is None          # window filling
    assert outs[2]["frame_index"] == 0 and outs[2]["vla"] is not None
    tail = svc.flush()
    assert [t["frame_index"] for t in tail] == [2, 3]
    assert all(t["vla"] is not None for t in tail)
    assert msgs == sync_msgs
    assert [o["vla"]["leaf_id"] for o in [outs[2], outs[3]] + tail] \
        == [v["leaf_id"] for v in sync_vla]


# --------------------------------------------------------------- framelog --

def _roundtrip_framelog(tmp_path, write_native, read_native):
    from leafgrasp_tpu.io.framelog import (FrameLogWriter, FrameLogReader,
                                           native_available)
    if (write_native or read_native) and not native_available():
        pytest.skip("native framelog unavailable")
    rng = np.random.default_rng(0)
    h, w, n = 24, 36, 5
    masks = rng.integers(0, 7, (n, h, w)).astype(np.int16)
    depths = rng.random((n, h, w)).astype(np.float32)
    p = str(tmp_path / "session.lflg")
    with FrameLogWriter(p, h, w, prefer_native=write_native) as wr:
        for i in range(n):
            wr.append(masks[i], depths[i], stamp_us=1000 + i)
        assert len(wr) == n
    with FrameLogReader(p, prefer_native=read_native) as rd:
        assert len(rd) == n and (rd.h, rd.w) == (h, w)
        for i in range(n):
            m, d, st = rd.frame(i)
            np.testing.assert_array_equal(m, masks[i])
            np.testing.assert_array_equal(d, depths[i])
            assert st == 1000 + i


@pytest.mark.parametrize("write_native,read_native",
                         [(True, True), (False, False),
                          (True, False), (False, True)])
def test_framelog_roundtrip_and_interop(tmp_path, write_native,
                                        read_native):
    """Native and numpy implementations must be byte-interoperable."""
    _roundtrip_framelog(tmp_path, write_native, read_native)


def test_framelog_torn_final_record_ignored(tmp_path):
    """A crash mid-append (torn last record) must not corrupt the log:
    the reader sees only the complete records."""
    from leafgrasp_tpu.io.framelog import FrameLogWriter, FrameLogReader
    h, w = 16, 20
    p = str(tmp_path / "torn.lflg")
    m = np.ones((h, w), np.int16)
    d = np.ones((h, w), np.float32)
    with FrameLogWriter(p, h, w) as wr:
        wr.append(m, d, 1)
        wr.append(m, d, 2)
    with open(p, "ab") as f:
        f.write(b"\x00" * 100)          # partial third record
    with FrameLogReader(p) as rd:
        assert len(rd) == 2
        assert rd.frame(1)[2] == 2


def test_grasp_service_record_and_replay(tmp_path):
    """GraspService(record_path=...) logs every processed frame; a
    replayed session reproduces the original published messages."""
    mask, depth = _scene()
    p = str(tmp_path / "rec.lflg")
    live_msgs = []
    svc = GraspService(CFG, publish=live_msgs.append, min_interval_s=0.0,
                       record_path=p)
    for i in range(3):
        svc.process_frame(np.roll(mask, i, axis=1),
                          np.roll(depth, i, axis=1), mask_stamp=i)
    svc.stop()

    from leafgrasp_tpu.io.framelog import FrameLogReader
    replay_msgs = []
    svc2 = GraspService(CFG, publish=replay_msgs.append,
                        min_interval_s=0.0)
    with FrameLogReader(p) as rd:
        assert len(rd) == 3
        for m, d, st in rd:
            svc2.process_frame(np.asarray(m), np.asarray(d), mask_stamp=st)
    assert replay_msgs == live_msgs


def _ridged_leaf(h=220, w=320, theta=0.5, cx=160, cy=110, a=90, b=32):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ct, st = np.cos(theta), np.sin(theta)
    xr = (xx - cx) * ct + (yy - cy) * st
    yr = -(xx - cx) * st + (yy - cy) * ct
    mask = (xr / a) ** 2 + (yr / b) ** 2 <= 1
    img = np.zeros((h, w), np.float32)
    img[mask] = 0.35
    img[mask & (np.abs(yr) < 2.5)] = 1.0
    return mask, img


@pytest.mark.parametrize("theta", [0.2, 0.5, 1.0, 2.3])
def test_detect_midrib_matches_cv2_transcription(theta):
    """Our contrast-norm ridge detector agrees with the reference's
    CLAHE/minAreaRect cv2 path (tests/reference_impl.py transcription of
    grasp_point_selector.py:829-922) within 6 deg on ridged leaves."""
    from tests.reference_impl import detect_midrib_reference
    mask, img = _ridged_leaf(theta=theta)
    ours = detect_midrib(mask, img)
    theirs = detect_midrib_reference(mask, img)
    assert ours is not None and theirs is not None

    def ang(p):
        (x1, y1), (x2, y2) = p
        return np.degrees(np.arctan2(y2 - y1, x2 - x1)) % 180

    d = abs(ang(ours) - ang(theirs))
    d = min(d, 180 - d)
    assert d < 6.0, (ang(ours), ang(theirs))


def test_visualizer_composite_draws_midrib():
    """The RGB half of the composite carries the red midrib line
    (reference visualizer.py:129-157)."""
    mask_f, img = _ridged_leaf()
    mask = mask_f.astype(np.int16) * 2      # leaf id 2
    rgb = np.stack([img] * 3, -1)
    vis = LeafVisualizer()
    comp = vis.render(mask, selected_leaf=2, rgb=rgb)
    h, w = mask.shape
    left = comp[:, :w]
    # pure-red pixels exist on the RGB half and none existed in the input
    red = (left[:, :, 0] > 200) & (left[:, :, 1] < 80) & \
        (left[:, :, 2] < 80)
    assert red.sum() > 50


def test_grasp_service_stop_races_run(tmp_path):
    """stop() from another thread while a pipelined run() loop is
    mid-stream: every published frame reaches the recorder before it
    closes, no exception escapes either thread, and results stay in
    frame order (regression: _inflight/recorder were mutated without a
    lock)."""
    import time
    from leafgrasp_tpu.io.framelog import FrameLogReader
    mask, depth = _scene()
    path = str(tmp_path / "race.fl")
    results = []
    errors = []
    svc = GraspService(CFG, on_result=results.append, min_interval_s=0.0,
                       pipeline_depth=2, record_path=path)

    def run():
        try:
            svc.run(poll_interval_s=0.0005)
        except Exception as e:          # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=run)
    t.start()
    try:
        for i in range(6):
            svc.on_mask(np.roll(mask, i, axis=1), stamp_us=i)
            svc.on_depth(np.roll(depth, i, axis=1), stamp_us=i)
            time.sleep(0.02)
    finally:
        svc.stop()                      # races the loop deliberately
        t.join(timeout=20)
    assert not t.is_alive() and not errors
    # frame order preserved
    idxs = [r["frame_index"] for r in results]
    assert idxs == sorted(idxs)
    # every recorded frame is intact (no append-after-close torn tail)
    with FrameLogReader(path) as rd:
        n_rec = sum(1 for _ in rd)
    assert n_rec >= len(results) > 0
