"""Streaming minibatch input pipeline over a host-resident dataset.

The reference implementation loads every dataset into process memory
(pure-Python loaders at N~1e3). The TPU build's stochastic paths
(models/dp_svi.py, models/svi_gplvm.py) touch only O(batch) rows per
step, so Y needs to be host-ADDRESSABLE, not device- (or even RSS-)
resident: the native loader (native/stream_loader.cpp, ctypes — same
zero-dependency pattern as native/amc_parser.cpp) mmaps a row-major
float32 file and gathers minibatch rows on a GIL-free C++ worker
thread. `ChunkStream` stacks `chunk` minibatches into one
(chunk, batch, d) block — the unit the scan-chunked training loops
dispatch — and double-buffers: while the device runs chunk k, the
worker gathers chunk k+1. This is the tf.data analogue the reference
never needed, sized for the regime where it matters: high-D outputs
(D >> Q), where Y dwarfs the N x Q variational state that stays
device-resident.

Indices are drawn host-side from `numpy.random.Generator(Philox)` —
the stream owns the sampling (the step must not resample; see
dp_svi.make_dp_svi_step(streaming=True), which takes (idx, y_b)
explicitly and is identity-tested against the resident path).

Falls back to a pure-numpy gather when no compiler is available
(`NumpyLoader`) — same API, tests assert native == numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_BUILD_ERR: str | None = None


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "native",
    )


def _build_and_load():
    src = os.path.join(_native_dir(), "stream_loader.cpp")
    so = os.path.join(_native_dir(), "libstreamloader.so")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 "-o", so, src],
                check=True, capture_output=True, text=True, timeout=300,
            )
        except Exception as e:  # no compiler / build failure
            global _BUILD_ERR
            _BUILD_ERR = f"native build failed: {e}"
            return None
    lib = ctypes.CDLL(so)
    lib.sl_open.restype = ctypes.c_void_p
    lib.sl_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    lib.sl_request.restype = ctypes.c_int
    lib.sl_request.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sl_wait.restype = ctypes.c_int
    lib.sl_wait.argtypes = [ctypes.c_void_p]
    lib.sl_rows.restype = ctypes.c_int64
    lib.sl_rows.argtypes = [ctypes.c_void_p]
    lib.sl_dims.restype = ctypes.c_int64
    lib.sl_dims.argtypes = [ctypes.c_void_p]
    lib.sl_close.restype = None
    lib.sl_close.argtypes = [ctypes.c_void_p]
    return lib


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None and _BUILD_ERR is None:
            _LIB = _build_and_load()
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def write_rows(path: str, Y) -> str:
    """Write Y (n, d) as the loader's on-disk format: raw row-major
    float32, no header (shape travels separately — callers keep it in
    their config/metadata). Returns path."""
    arr = np.ascontiguousarray(np.asarray(Y, dtype=np.float32))
    if arr.ndim != 2:
        raise ValueError(f"expected (n, d) matrix, got shape {arr.shape}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        arr.tofile(f)
    os.replace(tmp, path)
    return path


class NumpyLoader:
    """Pure-numpy fallback with the native loader's API (synchronous:
    request() performs the gather; wait() is a no-op check). Reference
    implementation for the parity test."""

    def __init__(self, path: str, n: int, d: int):
        self.n, self.d = int(n), int(d)
        # same no-copy property as the native mmap
        self._data = np.memmap(path, dtype=np.float32, mode="r",
                               shape=(self.n, self.d))
        self._err = 0

    def request(self, idx: np.ndarray, out: np.ndarray) -> None:
        idx = np.asarray(idx, dtype=np.int32)
        if idx.min(initial=0) < 0 or idx.max(initial=-1) >= self.n:
            self._err = -2
            return
        np.take(self._data, idx, axis=0, out=out.reshape(idx.size, self.d))
        self._err = 0

    def wait(self) -> None:
        if self._err:
            raise IndexError(f"row index out of range (status {self._err})")

    def close(self) -> None:
        del self._data


class StreamLoader:
    """Native mmap + async-gather loader. One outstanding request;
    `ChunkStream` double-buffers on top."""

    def __init__(self, path: str, n: int, d: int):
        lib = _lib()
        if lib is None:
            raise RuntimeError(_BUILD_ERR or "native loader unavailable")
        self._lib = lib
        self.n, self.d = int(n), int(d)
        self._h = lib.sl_open(path.encode(), self.n, self.d)
        if not self._h:
            raise OSError(
                f"sl_open failed for {path!r} (missing file or size < "
                f"{self.n}x{self.d} float32)"
            )

    def request(self, idx: np.ndarray, out: np.ndarray) -> None:
        """Start gathering rows idx into out ((count, d) or flat
        float32, C-contiguous) on the worker thread; returns
        immediately. out must stay alive until wait()."""
        idx = np.ascontiguousarray(idx, dtype=np.int32)
        assert out.dtype == np.float32 and out.flags.c_contiguous
        assert out.size == idx.size * self.d, (out.size, idx.size, self.d)
        rc = self._lib.sl_request(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            idx.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"sl_request failed (status {rc}; a "
                               "previous request still outstanding?)")
        # keep references so the buffers outlive the async gather
        self._inflight = (idx, out)

    def wait(self) -> None:
        rc = self._lib.sl_wait(self._h)
        self._inflight = None
        if rc != 0:
            raise IndexError(f"row index out of range (status {rc})")

    def close(self) -> None:
        if self._h:
            self._lib.sl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_loader(path: str, n: int, d: int):
    """Native loader when a compiler is present, numpy fallback
    otherwise (same API either way)."""
    if native_available():
        return StreamLoader(path, n, d)
    return NumpyLoader(path, n, d)


class ChunkStream:
    """Double-buffered stream of scan-chunks for the streaming training
    step: each item is (idx, y) with idx (chunk, batch) int32 drawn
    uniformly from [0, n) and y (chunk, batch, d) float32 — exactly the
    xs a `lax.scan` over dp_svi.make_dp_svi_step(streaming=True)
    consumes. While the device runs chunk k the worker gathers k+1.

    Sampling matches the resident path's distribution (iid uniform with
    replacement) but NOT its bitstream — the resident step samples via
    jax.random inside jit; the stream owns sampling on the host
    (numpy Philox seeded by `seed`). Exact-equality tests drive the
    step with hand-fed indices instead.
    """

    def __init__(self, loader, batch: int, chunk: int, seed: int = 0,
                 skip_chunks: int = 0):
        self.loader = loader
        self.batch = int(batch)
        self.chunk = int(chunk)
        self._rng = np.random.Generator(np.random.Philox(seed))
        # resume support: fast-forward the Philox stream past chunks a
        # previous (checkpointed) run already consumed — index draws
        # only, no row gathers, so this is O(skip * chunk * batch) int32
        for _ in range(int(skip_chunks)):
            self._rng.integers(
                0, loader.n, size=(self.chunk, self.batch),
                dtype=np.int32,
            )
        shape = (self.chunk, self.batch, loader.d)
        self._buf = [np.empty(shape, np.float32), np.empty(shape, np.float32)]
        self._idx = [None, None]
        self._slot = 0
        self._primed = False

    def _begin(self, slot: int) -> None:
        idx = self._rng.integers(
            0, self.loader.n, size=(self.chunk, self.batch), dtype=np.int32
        )
        self._idx[slot] = idx
        self.loader.request(idx.reshape(-1), self._buf[slot].reshape(-1))

    def next_chunk(self):
        """(idx (chunk,B) int32, y (chunk,B,D) f32). y aliases an
        internal buffer that the NEXT next_chunk() call's prefetch
        overwrites — consume it (device_put / jnp.asarray, which copy)
        before calling again. That is exactly the training-loop usage:
        dispatch chunk k, then ask for k+1 while the device runs."""
        if not self._primed:
            self._begin(self._slot)
            self._primed = True
        slot = self._slot
        self.loader.wait()
        idx, y = self._idx[slot], self._buf[slot]
        self._slot = 1 - slot
        self._begin(self._slot)        # prefetch the next chunk
        return idx, y

    def close(self) -> None:
        try:
            self.loader.wait()         # drain the in-flight gather
        except Exception:
            pass
        self.loader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
