#!/usr/bin/env python
"""Jitted augmentation pipeline with boxes + keypoints and exact inverse.

Run: python examples/augmentation_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import kornia_tpu.augmentation as A


def main():
    key = jax.random.PRNGKey(0)
    seq = A.AugmentationSequential(
        A.ColorJiggle(p=0.8),
        A.RandomAffine(degrees=15.0, translate=(0.1, 0.1), p=0.9),
        A.RandomHorizontalFlip(p=0.5),
        data_keys=["input", "bbox_xyxy", "keypoints"])
    img = jax.random.uniform(key, (8, 3, 128, 128))
    boxes = jnp.tile(jnp.array([[[20.0, 30, 80, 90]]]), (8, 1, 1))
    kps = jnp.tile(jnp.array([[[50.0, 60]]]), (8, 1, 1))
    out_img, out_boxes, out_kps = seq(img, boxes, kps, key=key)
    print("augmented:", out_img.shape, out_boxes[0, 0], out_kps[0, 0])
    back_img, back_kps = seq.inverse(out_img, out_kps,
                                     data_keys=["input", "keypoints"])
    print("inverse keypoint error:",
          float(jnp.abs(back_kps - kps).max()))


if __name__ == "__main__":
    main()
