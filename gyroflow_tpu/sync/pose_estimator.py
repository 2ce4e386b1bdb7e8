"""Camera pose estimation from frame pairs (gyro-video sync).

Port of /root/reference/src/core/synchronization/: optical flow (PyrLK via
OpenCV — optical_flow/pyrlk.rs) -> undistorted point pairs -> essential-matrix
pose (find_essential_mat.rs) -> per-pair rotation vector scaled to rad/s
(mod.rs:146), then the synthetic-gyro assembly of recalculate_gyro_data
(mod.rs:269-361: mid-frame timestamps, X/Y swap, deg/s).
"""
from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.file_metadata import TimeIMU
from ..core.filtering import lowpass_gyro_forward_backward

log = logging.getLogger(__name__)

RAD2DEG = 180.0 / math.pi


@dataclass
class FrameResult:
    """sync/mod.rs:52-64 (SyncResult)."""
    timestamp_us: int
    rotvec: Optional[np.ndarray] = None     # rad/s (already fps-scaled)
    points: int = 0
    # matched optical-flow pixel pairs (for rs-sync / visual_features):
    # p0 at timestamp_us, p1 at next_ts (sync/mod.rs optical_flow map)
    of_points: Optional[Tuple[np.ndarray, np.ndarray]] = None
    next_ts: int = 0


OF_METHODS = ("pyrlk", "dis", "akaze")  # OpticalFlowMethod (optical_flow/mod.rs:11-36)


class PoseEstimator:
    def __init__(self, compute_params, processing_size: Tuple[int, int],
                 of_method: str = "pyrlk"):
        self.cp = compute_params
        self.size = processing_size
        self.of_method = of_method if of_method in OF_METHODS else "pyrlk"
        self.results: Dict[int, FrameResult] = {}
        self.estimated_gyro: List[TimeIMU] = []
        self._prev = None  # (timestamp_us, gray, pts)
        self._dis = None

    def _flow_pairs(self, prev_gray, gray, prev_pts):
        """Matched point pairs (p0, p1) by the selected optical-flow method."""
        import cv2
        if self.of_method == "dis":
            # optical_flow/opencv_dis.rs: dense DIS flow sampled at features
            if self._dis is None:
                self._dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
            flow = self._dis.calc(prev_gray, gray, None)
            p0 = prev_pts.reshape(-1, 2)
            xi = np.clip(p0[:, 0].round().astype(int), 0, gray.shape[1] - 1)
            yi = np.clip(p0[:, 1].round().astype(int), 0, gray.shape[0] - 1)
            return p0, p0 + flow[yi, xi]
        if self.of_method == "akaze":
            # optical_flow/akaze.rs: feature match instead of tracking.
            # Binary descriptors + Hamming match; ORB stands in when the cv2
            # build ships without AKAZE.
            det = (cv2.AKAZE_create() if hasattr(cv2, "AKAZE_create")
                   else cv2.ORB_create(nfeatures=800))
            k0, d0 = det.detectAndCompute(prev_gray, None)
            k1, d1 = det.detectAndCompute(gray, None)
            if d0 is None or d1 is None or len(k0) < 8 or len(k1) < 8:
                return np.zeros((0, 2)), np.zeros((0, 2))
            matches = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True).match(d0, d1)
            matches = sorted(matches, key=lambda m: m.distance)[:300]
            p0 = np.asarray([k0[m.queryIdx].pt for m in matches])
            p1 = np.asarray([k1[m.trainIdx].pt for m in matches])
            return p0, p1
        nxt, st, _err = cv2.calcOpticalFlowPyrLK(prev_gray, gray, prev_pts, None,
                                                 winSize=(21, 21), maxLevel=3)
        if nxt is None or st is None:
            return np.zeros((0, 2)), np.zeros((0, 2))
        ok = st.reshape(-1) == 1
        return prev_pts.reshape(-1, 2)[ok], nxt.reshape(-1, 2)[ok]

    def feed_frame(self, timestamp_us: int, gray: np.ndarray, fps: float):
        """Track features from the previous frame and estimate the pair pose."""
        import cv2
        from ..ops.undistort_points import undistort_points_for_optical_flow

        pts = cv2.goodFeaturesToTrack(gray, maxCorners=200, qualityLevel=0.01,
                                      minDistance=16)
        if self._prev is not None and self._prev[2] is not None:
            prev_ts, prev_gray, prev_pts = self._prev
            p0, p1 = self._flow_pairs(prev_gray, gray, prev_pts)
            if len(p0) >= 8:
                # retain raw pairs for rs-sync / visual_features (rs_sync.rs
                # collect_points); pose estimation may still fail below
                self.results[prev_ts] = FrameResult(
                    prev_ts, of_points=(np.asarray(p0, np.float64),
                                        np.asarray(p1, np.float64)),
                    next_ts=timestamp_us, points=int(len(p0)))
                u0 = np.asarray(undistort_points_for_optical_flow(
                    p0.astype(np.float64), prev_ts, self.cp, self.size), np.float64)
                u1 = np.asarray(undistort_points_for_optical_flow(
                    p1.astype(np.float64), timestamp_us, self.cp, self.size), np.float64)
                good = (np.abs(u0) < 100).all(axis=1) & (np.abs(u1) < 100).all(axis=1)
                u0, u1 = u0[good], u1[good]
                if len(u0) >= 8:
                    # find_essential_mat.rs:37-45: LMEDS, threshold 1e-5,
                    # 4000 iters, triangulated recoverPose, >= 10 inliers
                    E, mask = cv2.findEssentialMat(
                        u0, u1, np.eye(3), method=cv2.LMEDS, prob=0.999,
                        threshold=1e-5, maxIters=4000)
                    if E is not None and E.shape == (3, 3):
                        inliers, R, _t, mask2, _tri = cv2.recoverPose(
                            E, u0, u1, np.eye(3), distanceThresh=100000.0,
                            mask=mask)
                        if inliers >= 10:
                            rv, _ = cv2.Rodrigues(R)
                            dt_s = (timestamp_us - prev_ts) / 1e6
                            if dt_s > 0:
                                fr = self.results.get(prev_ts) or FrameResult(prev_ts)
                                fr.rotvec = rv.reshape(3) / dt_s
                                fr.points = int(len(u0))
                                self.results[prev_ts] = fr
        self._prev = (timestamp_us, gray, pts)

    def recalculate_gyro_data(self, fps: float, lpf_hz: float = 0.0):
        """mod.rs:269-361: mid-frame timestamps, X/Y swap, deg/s, optional LPF."""
        gyro = []
        keys = sorted(self.results)
        for i, k in enumerate(keys):
            r = self.results[k]
            if r.rotvec is None:
                continue
            ts_ms = k / 1000.0
            if i + 1 < len(keys):
                ts_ms += (keys[i + 1] / 1000.0 - ts_ms) / 2.0
            e = r.rotvec
            gyro.append(TimeIMU(timestamp_ms=ts_ms,
                                gyro=np.array([e[1] * RAD2DEG, e[0] * RAD2DEG,
                                               e[2] * RAD2DEG])))
        if lpf_hz > 0.0 and fps > 0.0:
            lowpass_gyro_forward_backward(lpf_hz, fps, gyro)
        self.estimated_gyro = gyro
        return gyro
