#!/usr/bin/env python3
"""Mint the golden parquet oracle for f_g1_rbb_pipeline by EXECUTING the
reference's own geometry code (COCOUtils.py:8-15,40-89 via exec — the
corners2rotatedbbox permutation/clamp math and segmentation2bbox run
verbatim). Only minrect_from_segmentation needs shapely, which the
offline env lacks; it is replaced here by a monotone-chain hull +
rotating-calipers minimum rectangle implementing the SAME documented
corner-ordering contract as the engine (Geometry.scala:12-16: closed
CCW exterior starting from the lexicographically smallest corner —
downstream corners2rotatedbbox permutes corners anyway, so rectangle
semantics are identical to shapely's).

The fixture is only trustworthy because the query inputs make every
floating-point BRANCH decision robust to cross-engine ulp noise (see
GeomQueries.scala f_g1_rbb_pipeline): parallelogram alignment classes
differ by >=0.2% area (asserted below), clamp thresholds idle by
>=4.5x (asserted below), and the driver's %.9g canonicalization
absorbs value-level noise. This script ASSERTS those margins rather
than assuming them.

Dev tool: runs reference code to produce a test fixture; no reference
code is copied into the product.
Output: src/test/resources/rbb_golden.parquet  (column `npart` keys the
SF: the oracle SQL filters npart = count(*) of the part table.)
"""
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = open("/root/reference/MLPipelines/COCOUtils.py").read()
src = src.replace("from shapely.geometry import Polygon", "Polygon = None")
ns = {}
exec(src, ns)
corners2rotatedbbox = ns["corners2rotatedbbox"]
segmentation2bbox = ns["segmentation2bbox"]


def convex_hull(points):
    """Monotone chain, CCW, strict turns — mirrors Geometry.convexHull
    (distinct points, (x,y)-tuple sort, cross<=0 pop)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(ps):
        st = []
        for p in ps:
            while len(st) >= 2 and cross(st[-2], st[-1], p) <= 0:
                st.pop()
            st.append(p)
        return st

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def min_rotated_rect(seg):
    """Rotating calipers over the hull; closed CCW corners from the
    lexicographically smallest (Geometry.minRotatedRect contract).
    Returns (corners, margin) where margin is best2/best - 1 (the
    relative gap to the runner-up alignment class), or (None, None)
    for degenerate input."""
    points = [(seg[i], seg[i + 1]) for i in range(0, len(seg), 2)]
    hull = convex_hull(points)
    if len(hull) < 3:
        return None, None
    best = float("inf")
    best_corners = None
    areas = []
    n = len(hull)
    for i in range(n):
        p0, p1 = hull[i], hull[(i + 1) % n]
        length = math.hypot(p1[0] - p0[0], p1[1] - p0[1])
        if length <= 0:
            continue
        ux, uy = (p1[0] - p0[0]) / length, (p1[1] - p0[1]) / length
        nx, ny = -uy, ux  # left normal
        s = [x * ux + y * uy for x, y in hull]
        t = [x * nx + y * ny for x, y in hull]
        smin, smax, tmin, tmax = min(s), max(s), min(t), max(t)
        area = (smax - smin) * (tmax - tmin)
        areas.append(area)
        if area < best:
            best = area
            best_corners = [
                (ux * smin + nx * tmin, uy * smin + ny * tmin),
                (ux * smax + nx * tmin, uy * smax + ny * tmin),
                (ux * smax + nx * tmax, uy * smax + ny * tmax),
                (ux * smin + nx * tmax, uy * smin + ny * tmax),
            ]
    start = min(range(4), key=lambda k: best_corners[k])
    rotated = [best_corners[(start + k) % 4] for k in range(4)]
    # Margin vs the runner-up DISTINCT alignment class: opposite
    # parallelogram edges produce the same rect with near-identical
    # area, so "runner-up" means the smallest area more than 1e-9
    # relative above the winner.
    others = [a for a in areas if a > best * (1 + 1e-9)]
    margin = (min(others) / best - 1) if others else None
    return rotated + [rotated[0]], margin


def rows_for(part_keys, part_sizes):
    out = {k: [] for k in
           ["p_partkey", "rx", "ry", "rw", "rh", "rtheta",
            "cxmin", "cymin", "cw", "ch"]}
    for pk, psz in zip(part_keys, part_sizes):
        x0 = float(pk % 41)
        y0 = float(pk % 29)
        a = float(psz % 16 + 5)
        b = float(pk % 11 + 5)
        if pk % 10 == 0:
            seg = [x0, y0, x0 + a, y0, x0 + a * 2, y0]  # collinear
        else:
            seg = [x0, y0, x0 + a, y0 + 1,
                   x0 + a + 2, y0 + 1 + b, x0 + 2, y0 + b]
        corners, margin = min_rotated_rect(seg)
        if corners is None:
            assert pk % 10 == 0, f"non-degenerate row {pk} got no rect"
            continue
        assert pk % 10 != 0, f"degenerate row {pk} got a rect"
        # branch-robustness: unique winner by a real margin
        assert margin is not None and margin > 1e-3, \
            f"row {pk}: alignment classes too close (margin={margin})"
        rcoco = corners2rotatedbbox(corners, 4.0, 1.0, False)
        assert rcoco is not None
        x, y, w, h, theta = [float(v) for v in rcoco]
        # branch-robustness: clamps idle by a real margin
        assert w > 1.5 and h > 1.5 and w * h > 8.0, \
            f"row {pk}: clamp threshold too close (w={w} h={h})"
        coco = [float(v) for v in
                segmentation2bbox(np.array(seg, dtype=float).reshape(-1, 2))]
        out["p_partkey"].append(pk)
        out["rx"].append(x); out["ry"].append(y)
        out["rw"].append(w); out["rh"].append(h); out["rtheta"].append(theta)
        out["cxmin"].append(coco[0]); out["cymin"].append(coco[1])
        out["cw"].append(coco[2]); out["ch"].append(coco[3])
    return out


def main():
    batches = []
    for sf in ["0.001", "0.01", "0.1"]:
        part = pq.read_table(f"/root/testdata/sf{sf}/part.parquet",
                             columns=["p_partkey", "p_size"])
        keys = part["p_partkey"].to_pylist()
        sizes = part["p_size"].to_pylist()
        cols = rows_for(keys, sizes)
        npart = len(keys)
        cols["npart"] = [npart] * len(cols["p_partkey"])
        batches.append(pa.table(
            {k: pa.array(cols[k],
                         type=pa.int64() if k in ("p_partkey", "npart")
                         else pa.float64())
             for k in list(cols)}))
        print(f"sf{sf}: npart={npart} golden_rows={len(cols['p_partkey'])}")
    table = pa.concat_tables(batches)
    path = "src/test/resources/rbb_golden.parquet"
    pq.write_table(table, path)
    print(f"wrote {path}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
