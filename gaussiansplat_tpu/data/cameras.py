"""INRIA `cameras.json` reader (reference: `camera.jl:113-151`).

The INRIA trainer dumps, per camera: `position` (camera center, world),
`rotation` (3x3 camera-to-world rotation, row-major lists), `fx, fy, width,
height, img_name, id`. We convert to the world-to-camera form the projector
uses: R = rot^T, t = -rot^T @ position. (The reference instead reconstructs
eye/lookAt vectors and near/far-hardcodes 0.01/100, `camera.jl:133-134`.)
"""

from __future__ import annotations

import json
from typing import List

import numpy as np

from ..ops.camera import Camera, make_camera


def load_cameras_json(path: str) -> List[Camera]:
    with open(path) as f:
        entries = json.load(f)
    cams = []
    for e in sorted(entries, key=lambda d: d.get("id", 0)):
        rot = np.asarray(e["rotation"], np.float32)      # cam-to-world
        pos = np.asarray(e["position"], np.float32)
        R = rot.T
        t = -R @ pos
        cams.append(
            make_camera(
                R=R,
                t=t,
                fx=float(e["fx"]),
                fy=float(e["fy"]),
                width=int(e["width"]),
                height=int(e["height"]),
            )
        )
    return cams


def save_cameras_json(path: str, cameras: List[Camera]) -> None:
    entries = []
    for i, c in enumerate(cameras):
        R = np.asarray(c.R)
        entries.append(
            dict(
                id=i,
                img_name=f"{i:05d}",
                width=int(c.width),
                height=int(c.height),
                position=np.asarray(c.position).tolist(),
                rotation=R.T.tolist(),
                fx=float(c.fx),
                fy=float(c.fy),
            )
        )
    with open(path, "w") as f:
        json.dump(entries, f)
