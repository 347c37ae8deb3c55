#!/usr/bin/env python3
"""Mint a differential golden for the COCO exporter by EXECUTING the
reference's create_coco_from_feather.py (minus its PIL/feather imports,
which the writer functions don't use) on a small fixture.

Fixture rows are pre-sorted by (image_name) / (anno_key) so the
reference's insertion-order ids coincide with our deterministic
sort-order ids. Output: src/test/resources/coco_golden.json containing
{fixture, odtk_eval, odtk_train, d2}.
"""
import json, tempfile, os
import numpy as np
import pandas as pd

src = open("/root/reference/MLPipelines/create_coco_from_feather.py").read()
src = src.replace("from PIL import Image", "Image = None")
src = src.replace("import pyarrow.feather as feather", "feather = None")
src = src.replace("import pyarrow as pa", "pa = None")
ns = {}
exec(src, ns)
write_coco_dataset = ns["write_coco_dataset"]

annos = [
    # image_name, category, anno_key, segmentation, rcoco, rbox
    ("img_a", "cat", 1, [5.0, 5.0, 25.0, 5.0, 25.0, 15.0, 5.0, 15.0],
     [5.0, 5.0, 20.0, 10.0, 0.25], [5.5, 5.0, 25.0, 5.5, 24.5, 15.0, 5.0, 14.5]),
    ("img_a", "dog", 2, [1.0, 1.0, 9.0, 1.0, 9.0, 9.0, 1.0, 9.0],
     [1.0, 1.0, 8.0, 8.0, -0.5], [1.0, 1.0, 9.0, 1.0, 9.0, 9.0, 1.0, 9.0]),
    ("img_b", "dog", 3, [0.0, 0.0, 10.0, 0.0, 10.0, 6.0, 0.0, 6.0],
     [0.0, 0.0, 10.0, 6.0, 1.5], [0.5, 0.0, 10.0, 0.5, 9.5, 6.0, 0.0, 5.5]),
]
images = [("img_a", 640, 480), ("img_b", 320, 240)]

anno_df = pd.DataFrame({
    "image_name": [a[0] for a in annos],
    "category": [a[1] for a in annos],
    "anno_key": [a[2] for a in annos],
    "segmentation": [np.array(a[3]) for a in annos],
    "rcoco": [np.array(a[4]) for a in annos],
    "rbox": [np.array(a[5]) for a in annos],
})
images_df = pd.DataFrame({
    "image_name": [i[0] for i in images],
    "width": [i[1] for i in images],
    "height": [i[2] for i in images],
})

out = {"fixture": {"annos": annos, "images": images}}
with tempfile.TemporaryDirectory() as d:
    for key, train, odtk in [("odtk_eval", False, True), ("odtk_train", True, True),
                             ("d2", True, False)]:
        p = os.path.join(d, key + ".json")
        write_coco_dataset(anno_df, images_df, train, p, odtk=odtk)
        out[key] = json.load(open(p))

path = "src/test/resources/coco_golden.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}: {len(out['odtk_eval']['annotations'])} annos per variant")
