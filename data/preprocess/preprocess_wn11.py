#!/usr/bin/env python
"""Preprocess WN11-style datasets whose valid/test files carry +1/-1
labels in the fourth column. Usage: preprocess_wn11.py <folder>."""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from kge_tpu.utils.preprocess import preprocess_wn11

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("folder", type=str)
    args = parser.parse_args()
    print(f"Preprocessing {args.folder}...")
    preprocess_wn11(args.folder)
