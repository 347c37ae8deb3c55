#!/usr/bin/env python3
"""Mint golden vectors for GeometrySpec by EXECUTING the reference's own
geometry code (COCOUtils.py minus the shapely import, which our offline
env lacks and which only minrect_from_segmentation needs).

Dev tool: runs reference code to produce test fixtures; no reference code
is copied into the product. Output: src/test/resources/geometry_golden.json
"""
import json, math, random

src = open("/root/reference/MLPipelines/COCOUtils.py").read()
src = src.replace("from shapely.geometry import Polygon", "Polygon = None")
ns = {}
exec(src, ns)

calc_bearing = ns["calc_bearing"]
_c2r = ns["_corners2rotatedbbox"]
c2r = ns["corners2rotatedbbox"]
seg2bbox = ns["segmentation2bbox"]
aabb2poly = ns["aabb2poly"]
import numpy as np

random.seed(1234)
cases = []

# closed rectangle corner lists (what minrect emits), incl. tiny ones that
# trigger the clamp paths and rotated ones
def rect_corners(cx, cy, w, h, theta):
    pts = []
    for dx, dy in [(-w/2,-h/2),(w/2,-h/2),(w/2,h/2),(-w/2,h/2)]:
        x = cx + dx*math.cos(theta) - dy*math.sin(theta)
        y = cy + dx*math.sin(theta) + dy*math.cos(theta)
        pts.append([x, y])
    return pts + [pts[0]]

fixed = [
    rect_corners(10, 20, 8, 4, 0.0),
    rect_corners(0, 0, 3, 2, 0.5),
    rect_corners(5, 5, 0.5, 0.5, 1.0),      # tiny -> clamp
    rect_corners(-3, 7, 1.5, 0.4, -0.8),    # thin -> clamp
    rect_corners(100, -50, 40, 0.05, 2.6),  # sliver -> clamp + rescale
]
rand = [rect_corners(random.uniform(-50, 50), random.uniform(-50, 50),
                     random.uniform(0.05, 30), random.uniform(0.05, 30),
                     random.uniform(-math.pi, math.pi)) for _ in range(20)]

for corners in fixed + rand:
    case = {"corners": corners}
    case["bearing"] = calc_bearing(corners[0], corners[1])
    case["raw"] = [float(v) for v in _c2r(np.array(corners[:-1]))]
    r = c2r(corners, 4.0, 1.0, False)
    case["rbb"] = [float(v) for v in r] if r is not None else None
    rf = c2r(corners, 4.0, 1.0, True)
    case["rbb_filter_small"] = [float(v) for v in rf] if rf is not None else None
    cases.append(case)

segs = [
    [0, 0, 10, 0, 10, 5, 0, 5],
    [1.5, 2.5, 3.25, 8.125, 9.0, 4.5],
    [random.uniform(-100, 100) for _ in range(16)],
]
seg_cases = []
for seg in segs:
    b = seg2bbox(np.array(seg, dtype=float).reshape(-1, 2))
    seg_cases.append({"seg": seg, "bbox": [float(v) for v in b]})

aabbs = [[0, 0, 4, 3], [-2.5, 1.25, 10.0, 0.5]]
aabb_cases = [{"aabb": a, "poly": [float(v) for v in aabb2poly(np.array(a, dtype=float))]}
              for a in aabbs]

out = {"corner_cases": cases, "seg_cases": seg_cases, "aabb_cases": aabb_cases}
path = "src/test/resources/geometry_golden.json"
import os
os.makedirs(os.path.dirname(path), exist_ok=True)
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: {len(cases)} corner cases, {len(seg_cases)} seg, {len(aabb_cases)} aabb")
