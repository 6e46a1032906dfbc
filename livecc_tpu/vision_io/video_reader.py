"""Python surface over the native FFmpeg decoder (ctypes).

Decord-equivalent API (SURVEY.md §2b N1) used everywhere the reference
touches video: PTS table (``_frame_pts``-style seconds), ``get_batch`` with
repeated/ monotonic indices, average fps, native-size or pre-scaled output.

The shared library auto-builds from source on first use (``make`` + system
FFmpeg dev libs); ``is_available()`` gates tests/paths when the toolchain is
absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvideodec.so")
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        # Always invoke make: the Makefile's video_decoder.cpp dependency
        # makes this a no-op when the .so is up to date, and guarantees a
        # source edit is never shadowed by a stale binary.
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vr_open.argtypes = [ctypes.c_char_p]
        lib.vr_open.restype = ctypes.c_int64
        lib.vr_open_bytes.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.vr_open_bytes.restype = ctypes.c_int64
        lib.vr_num_frames.argtypes = [ctypes.c_int64]
        lib.vr_num_frames.restype = ctypes.c_int64
        lib.vr_avg_fps.argtypes = [ctypes.c_int64]
        lib.vr_avg_fps.restype = ctypes.c_double
        lib.vr_frame_size.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.vr_frame_size.restype = ctypes.c_int
        lib.vr_pts_seconds.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
        lib.vr_pts_seconds.restype = ctypes.c_int
        lib.vr_get_batch.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.vr_get_batch.restype = ctypes.c_int
        lib.vr_close.argtypes = [ctypes.c_int64]
        lib.vr_last_error.restype = ctypes.c_char_p
        lib.vr_encode_test_video.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vr_encode_test_video.restype = ctypes.c_int
        lib.vr_audio_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.vr_audio_open.restype = ctypes.c_int64
        lib.vr_audio_len.argtypes = [ctypes.c_int64]
        lib.vr_audio_len.restype = ctypes.c_int64
        lib.vr_audio_copy.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.vr_audio_copy.restype = ctypes.c_int
        lib.vr_audio_close.argtypes = [ctypes.c_int64]
        lib.vr_encode_test_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ]
        lib.vr_encode_test_audio.restype = ctypes.c_int
        lib.vr_encode_video_with_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ]
        lib.vr_encode_video_with_audio.restype = ctypes.c_int
        _lib = lib
        return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class VideoReader:
    """PTS-indexed random-access reader over one video.

    ``source`` is a filesystem path, raw container ``bytes`` (e.g. from a
    remote loader — reference video_process_patch.py:39-44), or a callable
    returning bytes (the reference's ``remote_loader`` hook shape).
    """

    def __init__(self, source):
        self._lib = _load()
        if callable(source):
            source = source()
        if isinstance(source, (bytes, bytearray, memoryview)):
            buf = (ctypes.c_uint8 * len(source)).from_buffer_copy(source)
            self._h = self._lib.vr_open_bytes(buf, len(source))
        else:
            self._h = self._lib.vr_open(source.encode())
        if self._h == 0:
            raise IOError(f"cannot open video: {self._lib.vr_last_error().decode()}")
        self._n = int(self._lib.vr_num_frames(self._h))
        self._pts: np.ndarray | None = None

    def __len__(self) -> int:
        return self._n

    @property
    def avg_fps(self) -> float:
        return float(self._lib.vr_avg_fps(self._h))

    @property
    def frame_size(self) -> tuple[int, int]:
        h, w = ctypes.c_int(), ctypes.c_int()
        self._lib.vr_frame_size(self._h, ctypes.byref(h), ctypes.byref(w))
        return h.value, w.value

    @property
    def pts_seconds(self) -> np.ndarray:
        """Per-frame display timestamps (the reference's _frame_pts[:,1])."""
        if self._pts is None:
            out = np.empty(self._n, np.float64)
            if self._lib.vr_pts_seconds(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))):
                raise IOError("pts read failed")
            self._pts = out
        return self._pts

    def get_batch(self, indices, out_hw: tuple[int, int] | None = None) -> np.ndarray:
        """Decode frames at display-order ``indices`` -> [T, H, W, 3] uint8.

        ``out_hw`` scales inside the native layer (libswscale bicubic) —
        use for fixed-resolution streaming reads.
        """
        idx = np.ascontiguousarray(np.asarray(indices, np.int64))
        if out_hw is None:
            h, w = self.frame_size
        else:
            h, w = out_hw
        out = np.empty((len(idx), h, w, 3), np.uint8)
        rc = self._lib.vr_get_batch(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            0 if out_hw is None else h, 0 if out_hw is None else w,
        )
        if rc != 0:
            raise IOError(f"get_batch failed: {self._lib.vr_last_error().decode()}")
        return out

    def close(self):
        if self._h:
            self._lib.vr_close(self._h)
            self._h = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Decode a media file's first audio stream -> mono float32 [T] at
    ``sample_rate`` (decord AudioReader equivalent; reference
    data/production/distributed_whisperx.py:14-16)."""
    lib = _load()
    h = lib.vr_audio_open(path.encode(), sample_rate)
    if h == 0:
        raise IOError(f"cannot open audio: {lib.vr_last_error().decode()}")
    try:
        n = int(lib.vr_audio_len(h))
        out = np.empty(n, np.float32)
        if n and lib.vr_audio_copy(h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))):
            raise IOError("audio copy failed")
        return out
    finally:
        lib.vr_audio_close(h)


def encode_test_audio(path: str, samples: np.ndarray, sample_rate: int = 16000) -> None:
    """Write mono float samples as a 16-bit WAV (tests)."""
    lib = _load()
    samples = np.ascontiguousarray(samples, np.float32)
    rc = lib.vr_encode_test_audio(
        path.encode(), samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples), sample_rate,
    )
    if rc != 0:
        raise IOError(f"audio encode failed: {lib.vr_last_error().decode()}")


def encode_video_with_audio(path: str, frames: np.ndarray, fps: int,
                            samples: np.ndarray, sample_rate: int) -> None:
    """One mp4 with an mpeg4 video track AND an AAC audio track — the
    render pipeline's muxed output (reference demo/render/video.py:186-200
    overlays the TTS track into the final mp4). ``samples`` is mono float32
    PCM; rates outside AAC's set are resampled in the native layer."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.uint8)
    samples = np.ascontiguousarray(samples, np.float32)
    t, h, w, c = frames.shape
    assert c == 3
    rc = lib.vr_encode_video_with_audio(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, fps, samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples), sample_rate,
    )
    if rc != 0:
        raise IOError(f"mux encode failed: {lib.vr_last_error().decode()}")


def encode_test_video(path: str, frames: np.ndarray, fps: int = 30) -> None:
    """Write synthetic [T, H, W, 3] uint8 frames as an mpeg4 clip (tests)."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    rc = lib.vr_encode_test_video(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), t, h, w, fps
    )
    if rc != 0:
        raise IOError(f"encode failed: {lib.vr_last_error().decode()}")
