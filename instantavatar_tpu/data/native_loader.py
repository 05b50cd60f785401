"""ctypes bindings + build driver for the native data engine.

Compiles ``native/avatar_loader.cpp`` on first use (g++, cached next to
the source) and exposes ``NativeSequenceCache`` — an in-RAM decoded
sequence with native patch sampling, a drop-in accelerator for
``AvatarDataset`` batches. Falls back gracefully (raises ImportError) when
a toolchain or libpng is unavailable; callers keep the Python path.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["build_native_lib", "NativeSequenceCache"]

_SRC = Path(__file__).parent / "native" / "avatar_loader.cpp"
_LIB = Path(__file__).parent / "native" / "libavatar_loader.so"
_lib_handle = None


def build_native_lib(force: bool = False) -> Path:
    if _LIB.exists() and not force \
            and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB),
           "-lpng", "-lpthread"]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise ImportError(
            f"native loader build failed:\n{res.stderr[-1000:]}")
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    lib = ctypes.CDLL(str(build_native_lib()))
    lib.avatar_load_sequence.restype = ctypes.c_void_p
    lib.avatar_load_sequence.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.avatar_seq_height.restype = ctypes.c_int
    lib.avatar_seq_height.argtypes = [ctypes.c_void_p]
    lib.avatar_seq_width.restype = ctypes.c_int
    lib.avatar_seq_width.argtypes = [ctypes.c_void_p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.avatar_sample_patches.restype = ctypes.c_int
    lib.avatar_sample_patches.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_uint64, f32p, f32p, f32p,
        i32p]
    lib.avatar_full_frame.restype = ctypes.c_int
    lib.avatar_full_frame.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      f32p, f32p]
    lib.avatar_free_sequence.argtypes = [ctypes.c_void_p]
    _lib_handle = lib
    return lib


class NativeSequenceCache:
    """Decode a whole sequence once (threaded, native), then serve
    mask-composited batches at native speed."""

    def __init__(self, image_paths: list[str], mask_paths: list[str],
                 downscale: int = 1, n_threads: int = 8):
        self.lib = _load()
        self.handle = self.lib.avatar_load_sequence(
            ";".join(image_paths).encode(),
            ";".join(mask_paths).encode(),
            len(image_paths), int(downscale), int(n_threads))
        if not self.handle:
            raise RuntimeError("native sequence load failed "
                               "(bad paths or unsupported format)")
        self.n_frames = len(image_paths)
        self.height = self.lib.avatar_seq_height(self.handle)
        self.width = self.lib.avatar_seq_width(self.handle)

    def sample_patches(self, idx: int, n_patches: int, patch_size: int,
                       ratio_mask: float = 1.0, dilate: int = 0,
                       seed: int = 0):
        P, S = n_patches, patch_size
        rgb = np.empty((P, S, S, 3), np.float32)
        alpha = np.empty((P, S, S), np.float32)
        bg = np.empty((P, S, S, 3), np.float32)
        coords = np.empty((P, 2), np.int32)
        rc = self.lib.avatar_sample_patches(
            self.handle, int(idx), P, S, float(ratio_mask), int(dilate),
            int(seed) & (2 ** 64 - 1), rgb.reshape(-1), alpha.reshape(-1),
            bg.reshape(-1), coords.reshape(-1))
        if rc != 0:
            raise RuntimeError(f"native sample_patches failed (rc={rc})")
        return rgb, alpha, bg, coords

    def full_frame(self, idx: int):
        rgb = np.empty((self.height, self.width, 3), np.float32)
        alpha = np.empty((self.height, self.width), np.float32)
        rc = self.lib.avatar_full_frame(self.handle, int(idx),
                                        rgb.reshape(-1), alpha.reshape(-1))
        if rc != 0:
            raise RuntimeError(f"native full_frame failed (rc={rc})")
        return rgb, alpha

    def __del__(self):
        if getattr(self, "handle", None):
            try:
                self.lib.avatar_free_sequence(self.handle)
            except Exception:
                pass
