"""CLI: COCO instances JSON -> TFRecord.

  python tools/create_coco_tf_record.py \
      --annotations_file=/data/coco/annotations/instances_train2017.json \
      --image_dir=/data/coco/train2017 \
      --output_path=/data/coco/coco_train.record
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtlx.data.coco import create_coco_tf_record


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--annotations_file", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--include_crowd", action="store_true")
    p.add_argument("--max_examples", type=int, default=None)
    args = p.parse_args()
    n = create_coco_tf_record(
        args.annotations_file,
        args.image_dir,
        args.output_path,
        include_crowd=args.include_crowd,
        max_examples=args.max_examples,
    )
    print(f"wrote {n} examples")


if __name__ == "__main__":
    main()
