"""Native host runtime: multithreaded batch synthesis + index preprocessing.

C++ implementation in ``loader.cpp``, exposed through a plain C ABI and
loaded with ctypes (this image has no pybind11). Compiled on demand with
``g++ -O3``; every entry point has a pure-numpy fallback so the package
works without a toolchain.

Public surface:
  * :func:`generate_batch` — uniform/Zipf table-batched sparse features.
  * :func:`decompose_indices_np` — host-side mixed-radix decomposition.
  * :func:`expand_offsets_np` — CSR offsets -> (rowidx, tableidx).
  * :class:`PrefetchLoader` — background-thread batch pipeline that keeps
    the host ahead of sub-millisecond device steps.
  * :func:`native_available` / :func:`build` — build management.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "loader.cpp")
_LIB_PATH = os.path.join(_THIS_DIR, "_libfbtt_loader.so")
_lib = None
_build_failed = False


def build(force: bool = False) -> Optional[str]:
    """Compile loader.cpp -> _libfbtt_loader.so; returns the path or None.

    Rebuilds when the source is newer than the cached library (so adding
    a symbol invalidates stale .so files)."""
    global _build_failed
    if (os.path.exists(_LIB_PATH) and not force
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=180,
        )
        return _LIB_PATH
    except Exception:
        _build_failed = True
        return None


def _load():
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fbtt_generate_batch.argtypes = [
        ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_double, ctypes.c_int32, i32p, i32p, f32p,
    ]
    lib.fbtt_decompose_indices.argtypes = [
        i32p, ctypes.c_int64, i32p, ctypes.c_int32, i32p,
    ]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.fbtt_decompose_indices64.argtypes = [
        i64p, ctypes.c_int64, i32p, ctypes.c_int32, i32p,
    ]
    lib.fbtt_expand_offsets.argtypes = [
        i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
    ]
    lib.fbtt_csr_to_padded.argtypes = [
        i32p, f32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, f32p,
    ]
    lib.fbtt_csr_to_padded.restype = ctypes.c_int64
    lib.fbtt_version.restype = ctypes.c_int32
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def generate_batch(
    seed: int,
    num_embeddings: int,
    num_tables: int,
    batch_size: int,
    pooling_factor: int,
    alpha: float = 1.0,
    weighted: bool = False,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """One table-batched sparse batch: (indices, offsets, weights|None).

    Native multithreaded sampler when built; numpy fallback otherwise.
    ``alpha > 1`` draws Zipf(alpha) mod E (the benchmark's skewed-traffic
    generator, ``tt_embeddings_benchmark.py:61-69``).
    """
    t, b, l = num_tables, batch_size, pooling_factor
    nnz = t * b * l
    lib = _load()
    if lib is not None:
        indices = np.empty(nnz, np.int32)
        offsets = np.empty(t * b + 1, np.int32)
        weights = np.empty(nnz, np.float32) if weighted else np.empty(0, np.float32)
        lib.fbtt_generate_batch(
            ctypes.c_uint64(seed), ctypes.c_int64(num_embeddings),
            t, b, l, ctypes.c_double(alpha), int(weighted),
            _i32p(indices), _i32p(offsets), _f32p(weights),
        )
        return indices, offsets, (weights if weighted else None)
    rng = np.random.default_rng(seed)
    if alpha <= 1.0:
        indices = rng.integers(0, num_embeddings, nnz).astype(np.int32)
    else:
        indices = (rng.zipf(alpha, nnz) % num_embeddings).astype(np.int32)
    offsets = np.arange(0, nnz + 1, l, dtype=np.int32)
    weights = rng.random(nnz).astype(np.float32) if weighted else None
    return indices, offsets, weights


def decompose_indices_np(indices: np.ndarray, p_shapes) -> np.ndarray:
    """Host-side mixed-radix decomposition -> [ndim, nnz] int32."""
    indices = np.ascontiguousarray(indices, np.int32)
    p = np.ascontiguousarray(p_shapes, np.int32)
    ndim = len(p)
    lib = _load()
    if lib is not None:
        out = np.empty((ndim, indices.size), np.int32)
        lib.fbtt_decompose_indices(
            _i32p(indices), ctypes.c_int64(indices.size), _i32p(p), ndim,
            _i32p(out),
        )
        return out
    strides = np.ones(ndim, np.int64)
    for t in range(ndim - 2, -1, -1):
        strides[t] = strides[t + 1] * p[t + 1]
    return np.stack([
        ((indices // strides[t]) % p[t]).astype(np.int32)
        for t in range(ndim)
    ])


def decompose_indices64_np(indices: np.ndarray, p_shapes) -> np.ndarray:
    """64-bit host decomposition -> [ndim, nnz] int32 (E >= 2^31 row ids;
    reference int64 cast at tt_embeddings_ops.py:823)."""
    indices = np.ascontiguousarray(indices, np.int64)
    p = np.ascontiguousarray(p_shapes, np.int32)
    ndim = len(p)
    lib = _load()
    if lib is not None:
        out = np.empty((ndim, indices.size), np.int32)
        lib.fbtt_decompose_indices64(
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(indices.size), _i32p(p), ndim, _i32p(out),
        )
        return out
    strides = np.ones(ndim, np.int64)
    for t in range(ndim - 2, -1, -1):
        strides[t] = strides[t + 1] * p[t + 1]
    return np.stack([
        ((indices // strides[t]) % p[t]).astype(np.int32)
        for t in range(ndim)
    ])


def expand_offsets_np(
    offsets: np.ndarray, num_tables: int, batch_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR offsets -> per-lookup (rowidx, tableidx), host-side."""
    offsets = np.ascontiguousarray(offsets, np.int32)
    nnz = int(offsets[-1])
    lib = _load()
    if lib is not None:
        rowidx = np.empty(nnz, np.int32)
        tableidx = np.empty(nnz, np.int32)
        lib.fbtt_expand_offsets(
            _i32p(offsets), num_tables, batch_size, _i32p(rowidx),
            _i32p(tableidx),
        )
        return rowidx, tableidx
    bag = np.searchsorted(offsets, np.arange(nnz), side="right") - 1
    return (bag % batch_size).astype(np.int32), (bag // batch_size).astype(np.int32)


def csr_to_padded_np(
    indices: np.ndarray,
    offsets: np.ndarray,
    num_tables: int,
    batch_size: int,
    pooling_factor: int,
    weights: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR (reference layout, ``tt_embeddings_ops.py:821-874``) ->
    fixed-pooling ``([T, B, L] int32, [T, B, L] float32)`` for the
    sharded mesh entries: pad slots get index -1 (counting-safe
    sentinel — dropped by LFU counting in every table mode) and weight
    0 (contributes nothing to forward or backward). Raises if any bag
    exceeds ``pooling_factor``. Native multithreaded when built; numpy
    fallback otherwise. Host-side: line-rate re-layout so multi-chip
    users need not hand-pad (round-4 verdict item #5).
    """
    t, b, l = num_tables, batch_size, pooling_factor
    indices = np.ascontiguousarray(indices, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    assert offsets.shape[0] == t * b + 1, (offsets.shape, t, b)
    lens = np.diff(offsets)
    if lens.min(initial=0) < 0:
        raise ValueError("offsets must be non-decreasing")
    if lens.max(initial=0) > l:
        raise ValueError(
            f"bag length {int(lens.max())} exceeds pooling_factor {l}")
    lib = _load()
    if lib is not None:
        idx_out = np.empty((t, b, l), np.int32)
        w_out = np.empty((t, b, l), np.float32)
        wp = (_f32p(np.ascontiguousarray(weights, np.float32))
              if weights is not None else
              ctypes.cast(None, ctypes.POINTER(ctypes.c_float)))
        over = lib.fbtt_csr_to_padded(
            _i32p(indices), wp, _i32p(offsets), t, b, l,
            _i32p(idx_out), _f32p(w_out))
        assert over == 0, over  # pre-checked above
        return idx_out, w_out
    nnz = indices.shape[0]
    bag_of = np.repeat(np.arange(t * b), lens)
    j = np.arange(nnz) - np.repeat(offsets[:-1], lens)
    idx_out = np.full((t * b, l), -1, np.int32)
    w_out = np.zeros((t * b, l), np.float32)
    idx_out[bag_of, j] = indices
    w_out[bag_of, j] = 1.0 if weights is None else weights
    return idx_out.reshape(t, b, l), w_out.reshape(t, b, l)


class PrefetchLoader:
    """Background-thread batch pipeline.

    Yields ``(indices, offsets, weights)`` numpy batches generated by the
    native sampler, ``depth`` batches ahead of the consumer — the host-side
    half of keeping a sub-millisecond device step fed.
    """

    def __init__(
        self,
        num_embeddings: int,
        num_tables: int,
        batch_size: int,
        pooling_factor: int,
        alpha: float = 1.0,
        weighted: bool = False,
        seed: int = 0,
        depth: int = 4,
        num_batches: Optional[int] = None,
    ) -> None:
        self._args = (num_embeddings, num_tables, batch_size, pooling_factor)
        self._alpha = alpha
        self._weighted = weighted
        self._seed = seed
        self._num_batches = num_batches
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        i = 0
        while not self._stop.is_set():
            if self._num_batches is not None and i >= self._num_batches:
                self._q.put(None)
                return
            batch = generate_batch(
                self._seed + i, *self._args, alpha=self._alpha,
                weighted=self._weighted,
            )
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue
            i += 1

    def __iter__(self) -> Iterator:
        while True:
            batch = self._q.get()
            if batch is None:
                return
            yield batch

    def close(self) -> None:
        self._stop.set()
