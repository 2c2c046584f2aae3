"""ctypes loader for the native (C++) runtime components.

Builds native/ on first use with g++ (cached as a .so); every native
component has a pure-Python fallback, so the framework works without a
toolchain — the native path just makes big-scene IO fast.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LOCK = threading.Lock()


def _build_lib(name: str, source: str) -> Optional[str]:
    so_path = os.path.join(_BUILD_DIR, f"lib{name}.so")
    src_path = os.path.join(_NATIVE_DIR, source)
    if not os.path.exists(src_path):
        return None
    with _LOCK:
        if (
            os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(src_path)
        ):
            return so_path
        os.makedirs(_BUILD_DIR, exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
                 "-shared", "-o", so_path, src_path],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    return so_path


class PlyNative:
    """Wrapper over native/ply_io.cpp."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.ply_open.restype = ctypes.c_void_p
        lib.ply_open.argtypes = [ctypes.c_char_p]
        lib.ply_vertex_count.restype = ctypes.c_int64
        lib.ply_vertex_count.argtypes = [ctypes.c_void_p]
        lib.ply_field_count.restype = ctypes.c_int32
        lib.ply_field_count.argtypes = [ctypes.c_void_p]
        lib.ply_field_name.restype = ctypes.c_char_p
        lib.ply_field_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ply_read_columns_f32.restype = None
        lib.ply_read_columns_f32.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.ply_close.restype = None
        lib.ply_close.argtypes = [ctypes.c_void_p]

    def parse_vertex_element(self, path: str) -> Dict[str, np.ndarray]:
        h = self._lib.ply_open(path.encode())
        if not h:
            raise IOError(f"native PLY parser could not open {path}")
        try:
            n = self._lib.ply_vertex_count(h)
            nf = self._lib.ply_field_count(h)
            names = [
                self._lib.ply_field_name(h, i).decode() for i in range(nf)
            ]
            out = np.empty((nf, n), np.float32)
            self._lib.ply_read_columns_f32(
                h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 0
            )
            return {name: out[i] for i, name in enumerate(names)}
        finally:
            self._lib.ply_close(h)


def load_ply_native() -> Optional[PlyNative]:
    so = _build_lib("ply_io", "ply_io.cpp")
    if so is None:
        return None
    try:
        return PlyNative(ctypes.CDLL(so))
    except OSError:
        return None


class ColmapNative:
    """Wrapper over native/colmap_io.cpp (points3D.bin / images.bin)."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        for fn in ("colmap_points_count", "colmap_images_count"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_char_p]
        lib.colmap_read_points3d.restype = ctypes.c_int64
        lib.colmap_read_points3d.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.colmap_read_images.restype = ctypes.c_int64
        lib.colmap_read_images.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
        ]

    def read_points3d(self, path: str):
        n = self._lib.colmap_points_count(path.encode())
        if n < 0:
            raise IOError(f"native COLMAP parser could not open {path}")
        xyz = np.empty((n, 3), np.float32)
        rgb = np.empty((n, 3), np.float32)
        got = self._lib.colmap_read_points3d(
            path.encode(),
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if got != n:
            raise IOError(f"truncated points3D.bin: {got}/{n} records")
        return xyz, rgb

    def read_images(self, path: str):
        n = self._lib.colmap_images_count(path.encode())
        if n < 0:
            raise IOError(f"native COLMAP parser could not open {path}")
        quat = np.empty((n, 4), np.float64)
        t = np.empty((n, 3), np.float64)
        cam_id = np.empty((n,), np.int32)
        names = ctypes.create_string_buffer(n * 256)
        got = self._lib.colmap_read_images(
            path.encode(),
            quat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cam_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            names,
        )
        if got != n:
            raise IOError(f"truncated images.bin: {got}/{n} records")
        out = []
        for i in range(n):
            raw = names.raw[i * 256 : (i + 1) * 256]
            out.append(
                dict(
                    quat=quat[i],
                    t=t[i],
                    camera_id=int(cam_id[i]),
                    name=raw.split(b"\x00", 1)[0].decode(),
                )
            )
        return out


def load_colmap_native() -> Optional[ColmapNative]:
    so = _build_lib("colmap_io", "colmap_io.cpp")
    if so is None:
        return None
    try:
        return ColmapNative(ctypes.CDLL(so))
    except OSError:
        return None
