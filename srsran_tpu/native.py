"""ctypes bindings for the native sample transport (native/sample_ring.cpp).

`SampleRing` is the RF-boundary buffer between native ingest (UDP pump /
radio driver) and the device-feeding Python loop — the role of the
reference's `ringbuffer.c` + `rf_zmq_imp.c` receive path, with the UDP pump
running entirely off the GIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "libsrsran_tpu_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # build on demand (g++ is part of the toolchain)
        subprocess.run(["make", "-C", os.path.dirname(path)], check=True, capture_output=True)
    lib = ctypes.CDLL(path)
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_size_t]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    for f in ("ring_readable", "ring_writable"):
        getattr(lib, f).restype = ctypes.c_size_t
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.ring_dropped.restype = ctypes.c_uint64
    lib.ring_dropped.argtypes = [ctypes.c_void_p]
    lib.ring_write.restype = ctypes.c_size_t
    lib.ring_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    lib.ring_read.restype = ctypes.c_size_t
    lib.ring_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    lib.ring_read_blocking.restype = ctypes.c_size_t
    lib.ring_read_blocking.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64,
    ]
    lib.udp_pump_start.restype = ctypes.c_int
    lib.udp_pump_start.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _lib = lib
    return lib


class SampleRing:
    """Lock-free SPSC complex64 ring with optional native UDP ingest."""

    def __init__(self, capacity_samples: int):
        self._lib = _load()
        self._h = self._lib.ring_create(capacity_samples)
        self.capacity = capacity_samples

    def write(self, samples: np.ndarray) -> int:
        x = np.ascontiguousarray(samples, np.complex64)
        return self._lib.ring_write(self._h, x.ctypes.data_as(ctypes.c_void_p), len(x))

    def read(self, n: int, timeout_s: float = 0.0) -> np.ndarray:
        out = np.empty(n, np.complex64)
        ptr = out.ctypes.data_as(ctypes.c_void_p)
        if timeout_s > 0:
            got = self._lib.ring_read_blocking(self._h, ptr, n, int(timeout_s * 1e6))
        else:
            got = self._lib.ring_read(self._h, ptr, n)
        return out[:got]

    @property
    def readable(self) -> int:
        return self._lib.ring_readable(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.ring_dropped(self._h)

    def start_udp_pump(self, port: int):
        rc = self._lib.udp_pump_start(self._h, port)
        if rc != 0:
            raise OSError(f"udp_pump_start failed: {rc}")

    def close(self):
        if self._h:
            self._lib.ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeLogBackend:
    """Async file-sink log backend (native/log_backend.cpp) — the srslog
    backend_worker role: `write()` never blocks on I/O; one native thread
    drains a bounded queue into the file."""

    def __init__(self, path: str, queue_capacity: int = 8192):
        lib = _load()
        if not hasattr(lib.slog_create, "_configured"):
            lib.slog_create.restype = ctypes.c_void_p
            lib.slog_create.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            lib.slog_write.restype = ctypes.c_int
            lib.slog_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
            for f in ("slog_dropped", "slog_written"):
                getattr(lib, f).restype = ctypes.c_uint64
                getattr(lib, f).argtypes = [ctypes.c_void_p]
            lib.slog_flush.argtypes = [ctypes.c_void_p]
            lib.slog_destroy.argtypes = [ctypes.c_void_p]
            lib.slog_create._configured = True
        self._lib = lib
        self._h = lib.slog_create(path.encode(), queue_capacity)
        if not self._h:
            raise OSError(f"cannot open log sink {path}")

    def write(self, line: str) -> bool:
        data = line.encode()
        return bool(self._lib.slog_write(self._h, data, len(data)))

    def flush(self):
        self._lib.slog_flush(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.slog_dropped(self._h)

    @property
    def written(self) -> int:
        return self._lib.slog_written(self._h)

    def close(self):
        if self._h:
            self._lib.slog_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
