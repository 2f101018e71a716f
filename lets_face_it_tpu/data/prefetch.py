"""Input pipeline acceleration: native batch gathering + async prefetch.

``NativeGather`` binds ``native/window_loader.cpp`` (OpenMP parallel window
copies) with a transparent numpy fallback; ``prefetch_batches`` runs any batch
iterator in a background thread with a bounded queue so host-side batch
assembly overlaps the accelerator step — the role of the reference's 8
DataLoader worker processes (mimicry_data_module.py:101-108), without
processes.
"""

from __future__ import annotations

import ctypes
import queue
import threading
from typing import Iterator

import numpy as np


class NativeGather:
    _lib = None
    _tried = False

    @classmethod
    def available(cls) -> bool:
        if not cls._tried:
            cls._tried = True
            try:
                from lets_face_it_tpu.utils.native import load_library

                lib = load_library("window_loader")
                lib.gather_windows.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
                cls._lib = lib
            except Exception:
                cls._lib = None
        return cls._lib is not None

    @classmethod
    def gather(cls, src: np.ndarray, starts: np.ndarray, seq_len: int,
               out: np.ndarray | None = None) -> np.ndarray:
        """src [T, D] float32, starts [B] -> [B, seq_len, D]."""
        n, d = len(starts), src.shape[1]
        if out is None:
            out = np.empty((n, seq_len, d), np.float32)
        if cls.available() and src.dtype == np.float32 and src.flags["C_CONTIGUOUS"]:
            starts64 = np.ascontiguousarray(starts, np.int64)
            cls._lib.gather_windows(
                src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), d,
                starts64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n, seq_len,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            return out
        idx = starts[:, None] + np.arange(seq_len)[None, :]
        out[:] = src[idx]
        return out


def prefetch_batches(iterator: Iterator, depth: int = 2,
                     transfer=None) -> Iterator:
    """Run ``iterator`` in a daemon thread; yield from a bounded queue.

    ``transfer`` (optional) is applied to each item inside the worker thread.
    Passing the host->device copy here (``jnp.asarray`` / ``shard_batch``,
    both async dispatches) double-buffers the upload against the accelerator
    step. This matters on a remote-TPU transport, where a b256 training batch
    is ~18 MB on the wire per step: issued from the consumer thread it
    serialises with the step dispatch (measured 2.8 steps/s end-to-end vs
    8.7 device-side), issued from the worker it overlaps.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up once the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item if transfer is None else transfer(item)):
                    return
        except BaseException as exc:  # propagate into the consumer
            err.append(exc)
        finally:
            _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # The consumer may abandon this generator early (max_steps break).
        # Without cleanup the worker stays blocked on q.put for the process
        # lifetime, pinning `depth`+1 transferred batches — device arrays
        # (plus their pinned host copies on the remote-TPU transport).
        def drain():
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

        stop.set()
        drain()          # unblock a put the worker entered before stop.set()
        t.join(timeout=5)
        drain()          # clear anything that put deposited (after stop, the
                         # worker's _put re-checks the flag and never puts)
