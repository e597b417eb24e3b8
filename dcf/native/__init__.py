"""ctypes loader for the native host core (SURVEY.md 2.4).

Builds `libdcf_native.so` from kitti_io.cpp on first use (g++ is in the
image; pybind11 is not, hence the plain C ABI + ctypes). Every entry point
has a numpy fallback, so the framework works without a compiler -- the
native path just makes the host data loop and the offline evaluator fast.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kitti_io.cpp")
_LIB_PATH = os.path.join(_HERE, "libdcf_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off",
             "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dcf_read_velodyne.restype = ctypes.c_int
        lib.dcf_read_velodyne.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.dcf_crop_pad.restype = ctypes.c_int
        lib.dcf_crop_pad.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
        for name in ("dcf_rotated_iou_bev", "dcf_iou_3d"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double)]
        u8ptr = ctypes.POINTER(ctypes.c_uint8)
        i32ptr = ctypes.POINTER(ctypes.c_int32)
        lib.dcf_fusion_ranks.restype = None
        lib.dcf_fusion_ranks.argtypes = [
            ctypes.POINTER(ctypes.c_float), u8ptr,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            i32ptr, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32ptr, i32ptr]
        lib.dcf_uvw_to_uvz.restype = None
        lib.dcf_uvw_to_uvz.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.dcf_image_s2d_u8.restype = None
        lib.dcf_image_s2d_u8.argtypes = [
            u8ptr, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.dcf_sort_points_fine.restype = None
        lib.dcf_sort_points_fine.argtypes = [
            ctypes.POINTER(ctypes.c_float), u8ptr, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), u8ptr]
        lib.dcf_eval_statistics.restype = None
        lib.dcf_eval_statistics.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def read_velodyne(path: str, max_points: int = 200_000) -> np.ndarray:
    """Fast .bin reader; falls back to np.fromfile."""
    lib = get_lib()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    buf = np.empty((max_points, 4), np.float32)
    n = lib.dcf_read_velodyne(path.encode(), _fptr(buf), buf.size)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:n // 4].copy()


def crop_pad(points: np.ndarray, roi, max_points: int):
    """Native ROI crop + pad; returns (out [max_points,4], mask)."""
    lib = get_lib()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        return None
    roi_arr = np.asarray(roi, np.float64)
    out = np.empty((max_points, 4), np.float32)
    mask = np.empty((max_points,), np.uint8)
    lib.dcf_crop_pad(_fptr(points), points.shape[0], _dptr(roi_arr),
                     max_points, points.shape[1], _fptr(out),
                     mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, mask.astype(bool)


def rotated_iou_bev(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Native pairwise rotated BEV IoU ([N,5] x [M,5])."""
    lib = get_lib()
    a = np.ascontiguousarray(boxes_a, np.float64).reshape(-1, 5)
    b = np.ascontiguousarray(boxes_b, np.float64).reshape(-1, 5)
    if lib is None:
        from dcf.geometry import np_boxes
        return np_boxes.rotated_iou_bev(a, b)
    out = np.empty((len(a), len(b)), np.float64)
    lib.dcf_rotated_iou_bev(_dptr(a), len(a), _dptr(b), len(b), _dptr(out))
    return out


def eval_statistics(overlaps, dt_scores, ignored_gt, ignored_det,
                    dc_overlap, min_overlap, thresholds,
                    gt_alphas=None, dt_alphas=None, py_fallback=None):
    """Devkit matching statistics at every threshold (see kitti_eval.py).

    Returns (tp, fp, fn, sim) arrays of shape [len(thresholds)]. Uses the
    C++ core when available; otherwise calls `py_fallback` (the parity
    twin `_frame_statistics`) once per threshold.
    """
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    t = len(thresholds)
    lib = get_lib()
    if lib is None:
        assert py_fallback is not None
        tp = np.zeros(t, np.int32)
        fp = np.zeros(t, np.int32)
        fn = np.zeros(t, np.int32)
        sim = np.zeros(t, np.float64)
        for i, thr in enumerate(thresholds):
            tp[i], fp[i], fn[i], sim[i] = py_fallback(
                overlaps, dt_scores, ignored_gt, ignored_det, dc_overlap,
                min_overlap, thr, gt_alphas=gt_alphas, dt_alphas=dt_alphas)
        return tp, fp, fn, sim
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    n_det, n_gt = overlaps.shape
    dt_scores = np.ascontiguousarray(dt_scores, np.float64)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int32)
    ignored_det = np.ascontiguousarray(ignored_det, np.int32)
    iptr = ctypes.POINTER(ctypes.c_int32)
    if dc_overlap is not None and dc_overlap.size:
        dc = np.ascontiguousarray(dc_overlap, np.float64)
        dc_ptr, n_dc = _dptr(dc), dc.shape[1]
    else:
        dc_ptr, n_dc = None, 0
    if gt_alphas is not None and dt_alphas is not None:
        ga = np.ascontiguousarray(gt_alphas, np.float64)
        da = np.ascontiguousarray(dt_alphas, np.float64)
        ga_ptr, da_ptr = _dptr(ga), _dptr(da)
    else:
        ga_ptr = da_ptr = None
    tp = np.zeros(t, np.int32)
    fp = np.zeros(t, np.int32)
    fn = np.zeros(t, np.int32)
    sim = np.zeros(t, np.float64)
    lib.dcf_eval_statistics(
        _dptr(overlaps), n_det, n_gt, _dptr(dt_scores),
        ignored_gt.ctypes.data_as(iptr), ignored_det.ctypes.data_as(iptr),
        dc_ptr, n_dc, float(min_overlap), _dptr(thresholds), t,
        ga_ptr, da_ptr,
        tp.ctypes.data_as(iptr), fp.ctypes.data_as(iptr),
        fn.ctypes.data_as(iptr), _dptr(sim))
    return tp, fp, fn, sim


def fusion_ranks(points: np.ndarray, mask: np.ndarray, uvz: np.ndarray,
                 strides, x_min: float, y_min: float, voxel_size: float,
                 grid_x: int, grid_y: int, img_h: int, img_w: int,
                 L: int):
    """Native per-scale fusion ranks + shared fine-row cum histogram.

    Bit-identical to the numpy half of preprocess.fusion_host_arrays
    (tested); returns (ranks [S, P] i32, row_cum [L] i32) or None when
    the native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    m = np.ascontiguousarray(mask, np.uint8)
    u = np.ascontiguousarray(uvz, np.float32)
    s = np.ascontiguousarray(strides, np.int32)
    P = pts.shape[0]
    S = len(s)
    ranks = np.empty((S, P), np.int32)
    row_cum = np.empty((L,), np.int32)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.dcf_fusion_ranks(
        _fptr(pts), m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _fptr(u), P, s.ctypes.data_as(i32), S,
        float(x_min), float(y_min), float(voxel_size),
        int(grid_x), int(grid_y), int(img_h), int(img_w), int(L),
        ranks.ctypes.data_as(i32), row_cum.ctypes.data_as(i32))
    return ranks, row_cum


def uvw_to_uvz(uvw: np.ndarray):
    """Native perspective divide (exact twin of the numpy chain in
    preprocess.fusion_host_arrays). Returns [P, 3] f32 or None."""
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(uvw, np.float32)
    out = np.empty_like(w)
    lib.dcf_uvw_to_uvz(_fptr(w), w.shape[0], _fptr(out))
    return out


def image_s2d_u8(image_u8: np.ndarray, H: int, W: int):
    """Native fused u8 -> f32 letterbox + s2d(4). Returns
    [H/4, W/4, 48] f32 or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(image_u8, np.uint8)
    h2, w2 = img.shape[:2]
    out = np.empty((H // 4, W // 4, 48), np.float32)
    lib.dcf_image_s2d_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h2, w2, int(H), int(W), _fptr(out))
    return out


def sort_points_fine(points: np.ndarray, mask: np.ndarray,
                     x_min: float, y_min: float, voxel_size: float,
                     fine: int, grid_x: int, grid_y: int):
    """Native fine-grid counting sort (identical permutation to the
    stable-argsort twin). Returns (points, mask) or None."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    m = np.ascontiguousarray(mask, np.uint8)
    P = pts.shape[0]
    out = np.empty_like(pts)
    om = np.empty((P,), np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.dcf_sort_points_fine(
        _fptr(pts), m.ctypes.data_as(u8), P,
        float(x_min), float(y_min), float(voxel_size),
        int(fine), int(grid_x), int(grid_y),
        _fptr(out), om.ctypes.data_as(u8))
    return out, om.astype(bool)


def iou_3d(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Native pairwise 3D IoU ([N,7] x [M,7])."""
    lib = get_lib()
    a = np.ascontiguousarray(boxes_a, np.float64).reshape(-1, 7)
    b = np.ascontiguousarray(boxes_b, np.float64).reshape(-1, 7)
    if lib is None:
        from dcf.geometry import np_boxes
        return np_boxes.iou_3d(a, b)
    out = np.empty((len(a), len(b)), np.float64)
    lib.dcf_iou_3d(_dptr(a), len(a), _dptr(b), len(b), _dptr(out))
    return out
