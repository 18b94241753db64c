#!/usr/bin/env python3
"""Why does pipeline_depth=1 LOSE for the VLA service? (VERDICT r4 #2)

The r4 A/B (tools/bench_vla_service.py, artifacts/vla_service_bench.json)
measured the overlapped service at 0.917x of serial -- the overlap
feature (9e85aad) is a measured loss. The candidate mechanisms:

  (a) single-TensorCore serialization: the next frame's ~13-17 ms grasp
      program queues ahead of the rerank's prefill, delaying it -- but
      that work happens either way, so it only REORDERS, bounded by one
      frame compute (~1% of the 1.7 s frame period);
  (b) tunnel contention: the next frame's ~9 MB mask+depth host->device
      transfer (~370 ms at the measured ~24 MB/s tunnel bandwidth,
      PERF.md "Service soak") is dispatched asynchronously and then
      streams UNDER the oldest frame's host-driven rerank -- whose 10
      decode steps each pay a small dispatch+fetch round trip. If the
      tunnel is one head-of-line-blocked stream, every decode-step
      round trip waits behind bulk transfer chunks.

This probe isolates (b) without 7B weights: time a tiny
dispatch+fetch op (a decode-step stand-in) N times on a quiet tunnel,
then again while a background thread streams 9 MB device_puts.
It also times the 9 MB device_put alone (the bulk term) and a tiny
fetch behind a dispatched production frame program (term (a)).

Run on the chip: python tools/probe_overlap_contention.py [--json]
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # decode-step stand-in: tiny compute, one dispatch + one scalar fetch
    @jax.jit
    def tiny(x):
        return jnp.sum(x * 1.000001)

    x = jax.device_put(jnp.ones((128,), jnp.float32))
    _ = float(tiny(x))                                # compile

    def step_rtts(n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(tiny(x))                        # dispatch + fetch
            ts.append(time.perf_counter() - t0)
        return np.asarray(ts) * 1e3

    # one frame's wire payload: int16 mask + f32 depth at 1080x1440
    mask = np.zeros((1080, 1440), np.int16)
    depth = np.ones((1080, 1440), np.float32)
    payload_mb = (mask.nbytes + depth.nbytes) / 2 ** 20

    def put_frame():
        t0 = time.perf_counter()
        a = jax.device_put(mask)
        b = jax.device_put(depth)
        # fetch a scalar touching both so the transfer is provably done
        _ = int(np.asarray(a[0, 0])) + float(np.asarray(b[0, 0]))
        return time.perf_counter() - t0

    put_frame()                                       # warm path
    t_put = min(put_frame() for _ in range(3))

    quiet = step_rtts(args.steps)

    # contended: stream frame payloads from another thread while the
    # "decode loop" runs (the overlapped service's exact shape: the
    # next frame's ingest under the oldest frame's rerank)
    stop = threading.Event()
    puts_done = []

    def streamer():
        while not stop.is_set():
            puts_done.append(put_frame())

    th = threading.Thread(target=streamer, daemon=True)
    th.start()
    time.sleep(0.05)                                  # ensure in flight
    contended = step_rtts(args.steps)
    stop.set()
    th.join(timeout=30)

    # term (a): tiny fetch queued behind one dispatched frame program
    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    cfg = DEFAULT_CONFIG
    fm, fd = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                             num_leaves=6, seed=8, margin=120)
    fm_d, fd_d = jax.device_put(fm), jax.device_put(fd)
    fn = make_frame_fn(cfg, with_cnn=False)
    r = fn(fm_d, fd_d, np.float32(707.9), np.float32(494.1),
           np.float32(1750.7))
    _ = np.asarray(r.grasp_uv)                        # compile
    behind = []
    for _ in range(5):
        r = fn(fm_d, fd_d, np.float32(707.9), np.float32(494.1),
               np.float32(1750.7))                    # async dispatch
        t0 = time.perf_counter()
        _ = float(tiny(x))
        behind.append(time.perf_counter() - t0)
    behind = np.asarray(behind) * 1e3

    rec = dict(
        metric="overlap_contention_probe",
        payload_mb=round(payload_mb, 2),
        frame_put_fetch_ms=round(t_put * 1e3, 1),
        tunnel_mb_s=round(payload_mb / t_put, 1),
        tiny_rtt_quiet_ms=dict(
            mean=round(float(quiet.mean()), 2),
            p95=round(float(np.percentile(quiet, 95)), 2)),
        tiny_rtt_under_ingest_ms=dict(
            mean=round(float(contended.mean()), 2),
            p95=round(float(np.percentile(contended, 95)), 2),
            max=round(float(contended.max()), 2)),
        contention_slowdown=round(
            float(contended.mean() / quiet.mean()), 2),
        tiny_rtt_behind_frame_program_ms=dict(
            mean=round(float(behind.mean()), 2),
            max=round(float(behind.max()), 2)),
        concurrent_puts_completed=len(puts_done),
    )
    print(json.dumps(rec, indent=None if args.json else 2))


if __name__ == "__main__":
    main()
