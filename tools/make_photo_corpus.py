#!/usr/bin/env python
"""Write the real-photograph patch corpus to disk as .jpg files.

The reference's live path trains on a DIRECTORY of photographs
(/root/reference/pretrain_damsm.py:48-53: Dataset(rootdir) recursive .jpg
scan). LSUN is not fetchable here, so this materializes the same corpus the
cluster-quality harness samples in memory (attngan_tpu/data/synthetic.py::
make_photo_patch_dataset — random-scale patches of the real photos bundled
with sklearn/matplotlib) as actual JPEG files, so the WHOLE three-phase
product pipeline can run on it through the real CLIs:

  python tools/make_photo_corpus.py --num-images 384 --out /tmp/photo_corpus
  python pretrain_damsm.py --data-root /tmp/photo_corpus --cluster ...
  python train.py --data-root /tmp/photo_corpus ...
  python test.py --image-names <patch names> --swap 1 ...

Also writes factors.json ({name: {photo, region}}) so clustering quality
on the SAME corpus remains measurable (ARI vs source photo).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-images", type=int, default=384)
    p.add_argument("--out", default="/tmp/photo_corpus")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quality", type=int, default=95)
    return p.parse_args()


def main():
    args = parse_args()
    from PIL import Image

    from attngan_tpu.data.synthetic import make_photo_patch_dataset

    dataset, factors = make_photo_patch_dataset(args.num_images,
                                                seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    meta = {}
    for i, rec in enumerate(dataset.records):
        name = os.path.basename(rec.fpath)          # e.g. china_00012.jpg
        Image.fromarray(rec.pixels).save(
            os.path.join(args.out, name), quality=args.quality)
        meta[name] = {"photo": int(factors["photo"][i]),
                      "region": int(factors["region"][i])}
    with open(os.path.join(args.out, "factors.json"), "w") as f:
        json.dump(meta, f)
    print(f"wrote {len(meta)} patches to {args.out}")


if __name__ == "__main__":
    main()
