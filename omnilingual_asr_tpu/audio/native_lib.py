"""ctypes loader (and on-demand builder) for the native C++ `omniaudio`
decoder library.

The native library replaces the reference's ffmpeg/ffprobe subprocess calls
(reference gemini_pipeline.py:222-310) with in-process decoding. The C ABI is
deliberately tiny:

    int32_t omniaudio_decode(const char* path, float** out, int64_t* n, int32_t* sr);
    void    omniaudio_free(float* p);
    double  omniaudio_duration(const char* path);

Python-side we build it with g++ the first time it is needed and cache the
.so next to the sources. If the toolchain is unavailable the callers fall
back to the pure-Python decoders in decode.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_SO_PATH = _NATIVE_DIR / "libomniaudio.so"
_SOURCES = ["omniaudio.cpp"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _libav_flags() -> list:
    """Compile against system libavformat/libavcodec/libswresample when the
    dev headers exist (in-process replacement for the reference's ffmpeg
    subprocess, covering MP3/FLAC/OGG/M4A/AAC)."""
    for inc in ("/usr/include", "/usr/include/x86_64-linux-gnu"):
        if (Path(inc) / "libavcodec" / "avcodec.h").exists():
            return ["-DOMNIAUDIO_WITH_LIBAV", f"-I{inc}",
                    "-lavformat", "-lavcodec", "-lavutil", "-lswresample"]
    return []


def _build() -> bool:
    srcs = [_NATIVE_DIR / s for s in _SOURCES if (_NATIVE_DIR / s).exists()]
    if not srcs:
        return False
    newest_src = max(s.stat().st_mtime for s in srcs)
    if _SO_PATH.exists() and _SO_PATH.stat().st_mtime >= newest_src:
        return True

    def run(extra):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", str(_SO_PATH), *[str(s) for s in srcs], *extra]
        return subprocess.run(cmd, capture_output=True, text=True, timeout=300)

    try:
        libav = _libav_flags()
        proc = run(["-march=native", *libav])
        if proc.returncode != 0:
            proc = run(libav)          # odd toolchains: no -march=native
        if proc.returncode != 0 and libav:
            proc = run([])             # no system codecs: WAV-only build
        return proc.returncode == 0 and _SO_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.getenv("OMNIASR_DISABLE_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            return None
        out_args = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.omniaudio_decode.restype = ctypes.c_int32
        lib.omniaudio_decode.argtypes = [ctypes.c_char_p, *out_args]
        lib.omniaudio_decode_rate.restype = ctypes.c_int32
        lib.omniaudio_decode_rate.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, *out_args]
        lib.omniaudio_free.restype = None
        lib.omniaudio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.omniaudio_duration.restype = ctypes.c_double
        lib.omniaudio_duration.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_decode(path: Path,
                  target_sr: int = 0) -> Optional[Tuple[np.ndarray, int]]:
    """Decode via the native library; None if unsupported/failed.

    target_sr > 0 also resamples in native code (libswresample)."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64(0)
    sr = ctypes.c_int32(0)
    rc = lib.omniaudio_decode_rate(str(path).encode(), int(target_sr),
                                   ctypes.byref(out), ctypes.byref(n),
                                   ctypes.byref(sr))
    if rc != 0 or n.value <= 0 or not out:
        return None
    try:
        buf = np.ctypeslib.as_array(out, shape=(n.value,))
        samples = np.array(buf, dtype=np.float32, copy=True)
    finally:
        lib.omniaudio_free(out)
    return samples, int(sr.value)


def native_duration(path: Path) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    d = lib.omniaudio_duration(str(path).encode())
    return float(d) if d > 0 else None
