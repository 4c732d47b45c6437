#!/usr/bin/env python
"""Preprocess a raw dataset folder (train/valid/test.txt) into indexed
.del files + dataset.yaml. Usage: preprocess_default.py <folder>
[--order_sop]."""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from kge_tpu.utils.preprocess import preprocess_default

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("folder", type=str)
    parser.add_argument("--order_sop", action="store_true")
    args = parser.parse_args()
    print(f"Preprocessing {args.folder}...")
    preprocess_default(args.folder, order_sop=args.order_sop)
