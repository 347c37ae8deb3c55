#!/usr/bin/env python3
"""Mint differential goldens for the YOLO exporter by EXECUTING the
reference's write_yolo_dataset (create_yolo_from_feather.py - no PIL
dependency; feather import stubbed) on a fixture shared with the Scala
spec. Output: src/test/resources/yolo_golden.json
"""
import json, tempfile, os
import numpy as np
import pandas as pd

src = open("/root/reference/MLPipelines/create_yolo_from_feather.py").read()
src = src.replace("import pyarrow.feather as feather", "feather = None")
ns = {}
exec(src, ns)
write_yolo_dataset = ns["write_yolo_dataset"]

annos = [
    ("img_a", "cat", 1, [5.0, 5.0, 25.0, 5.0, 25.0, 15.0, 5.0, 15.0]),
    ("img_a", "dog", 2, [1.0, 1.0, 9.0, 1.0, 9.0, 9.0, 1.0, 9.0]),
    ("img_b", "dog", 3, [8.0, 4.0, 40.0, 4.0, 40.0, 20.0, 8.0, 20.0]),
]
images = [("img_a", 640, 480), ("img_b", 320, 240), ("img_unused", 100, 100)]

anno_df = pd.DataFrame({
    "image_name": [a[0] for a in annos],
    "category": [a[1] for a in annos],
    "anno_key": [a[2] for a in annos],
    "segmentation": [np.array(a[3]) for a in annos],
})
images_df = pd.DataFrame({
    "image_name": [i[0] for i in images],
    "width": [i[1] for i in images],
    "height": [i[2] for i in images],
})
cat_map = {"cat": 1, "dog": 2}  # lexicographic ids from 1, as Coco.categoryDim

out = {"fixture": {"annos": annos, "images": images}}
for key, seg in [("bbox", False), ("segmentation", True)]:
    with tempfile.TemporaryDirectory() as d:
        write_yolo_dataset(anno_df, images_df, cat_map, d, segmentation=seg)
        files = {}
        for fn in sorted(os.listdir(d)):
            files[fn] = open(os.path.join(d, fn)).read()
        out[key] = files

path = "src/test/resources/yolo_golden.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: files per variant = {list(out['bbox'].keys())}")
