#!/usr/bin/env python3
"""Mint golden vectors for the track-interpolation port by EXECUTING the
reference's own interpolate_shapes (CvatApi.py:427-731, extracted as a
standalone function - it only needs numpy/itertools/copy, not the
requests/PIL the full module imports).

Output: src/test/resources/interp_golden.json
"""
import json, textwrap, random

lines = open("/root/reference/MLPipelines/CvatApi.py").read().split("\n")
# method body: lines 427..731 (1-based), dedent one level, drop `self`
body = "\n".join(lines[426:731])
body = textwrap.dedent(body)
body = body.replace("def interpolate_shapes(self, track, end_frame):",
                    "def interpolate_shapes(track, end_frame):")
ns = {}
exec("import numpy as np\nfrom copy import deepcopy\nfrom itertools import chain\n" + body, ns)
interpolate_shapes = ns["interpolate_shapes"]

def shape(frame, points, outside=False, attrs=None):
    return {"frame": frame, "type": "polygon", "points": list(points),
            "outside": outside, "occluded": False, "z_order": 0,
            "attributes": attrs or []}

def sq(x, y, s):
    return [x, y, x + s, y, x + s, y + s, x, y + s]

random.seed(99)
def rand_poly(n):
    return [round(random.uniform(0, 100), 2) for _ in range(2 * n)]

cases = [
    # 1: simple grow, same point count, trailing propagate
    {"track": {"frame": 0, "shapes": [shape(0, sq(0, 0, 10)), shape(5, sq(10, 10, 20))]},
     "end_frame": 10},
    # 2: different point counts (4-gon vs 6-gon) -> matching + reduction
    {"track": {"frame": 0, "shapes": [shape(0, sq(0, 0, 10)),
                                      shape(4, [0,0, 20,0, 30,10, 20,20, 0,20, -5,10])]},
     "end_frame": 6},
    # 3: outside middle keyframe breaks interpolation
    {"track": {"frame": 0, "shapes": [shape(0, sq(0, 0, 8)),
                                      shape(3, sq(5, 5, 8), outside=True),
                                      shape(6, sq(10, 10, 8))]},
     "end_frame": 9},
    # 4: end_frame before the last keyframe (break branch)
    {"track": {"frame": 0, "shapes": [shape(0, sq(0, 0, 10)), shape(8, sq(40, 40, 10))]},
     "end_frame": 5},
    # 5: single keyframe -> pure propagate
    {"track": {"frame": 2, "shapes": [shape(2, sq(1, 2, 3))]}, "end_frame": 6},
    # 6: outside final keyframe -> no trailing propagate
    {"track": {"frame": 0, "shapes": [shape(0, sq(0, 0, 4)), shape(2, sq(2, 2, 4), outside=True)]},
     "end_frame": 8},
    # 7: attribute propagation between keyframes
    {"track": {"frame": 0, "shapes": [
        shape(0, sq(0, 0, 5), attrs=[{"spec_id": 1, "value": "a"}, {"spec_id": 2, "value": "b"}]),
        shape(3, sq(3, 3, 5), attrs=[{"spec_id": 2, "value": "c"}])]},
     "end_frame": 5},
    # 8: random polygons, three keyframes, bigger gaps
    {"track": {"frame": 0, "shapes": [shape(0, rand_poly(5)), shape(7, rand_poly(8)),
                                      shape(12, rand_poly(4))]},
     "end_frame": 15},
    # 9: track frame offset (clip below track.frame never triggers but ported)
    {"track": {"frame": 3, "shapes": [shape(3, sq(0, 0, 6)), shape(6, sq(6, 0, 6))]},
     "end_frame": 8},
]

out = []
for c in cases:
    from copy import deepcopy
    original_shapes = deepcopy(c["track"]["shapes"])  # the algorithm mutates inputs
    res = interpolate_shapes(c["track"], c["end_frame"])
    out.append({
        "track_frame": c["track"]["frame"],
        "end_frame": c["end_frame"],
        "shapes_in": original_shapes,
        "result": [{"frame": s["frame"], "points": s["points"],
                    "outside": s["outside"], "keyframe": s.get("keyframe", False),
                    "attributes": s["attributes"]} for s in res],
    })

path = "src/test/resources/interp_golden.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: {len(out)} cases, "
      f"{sum(len(c['result']) for c in out)} result shapes")
