"""Exact integer box-resize tests: hand goldens, divisor-geometry
block averages, identity/constant/upscale properties, a generated
sweep against a straightforward float model (floor-compatible), and
loud size mismatches."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from datapipeline_scripts_spark.extensions.imageops import box_resize_gray


def test_divisor_geometry_is_block_average():
    # 4x2 -> 2x1: each output = floor(mean of a 2x2 block)
    img = bytes([10, 20, 30, 40,
                 50, 60, 70, 80])
    out = box_resize_gray(img, 4, 2, 2, 1)
    assert list(out) == [(10 + 20 + 50 + 60) // 4, (30 + 40 + 70 + 80) // 4]


def test_identity_constant_and_upscale():
    img = bytes(range(12))
    assert box_resize_gray(img, 4, 3, 4, 3) == img
    const = bytes([77] * 35)
    for tw, th in ((1, 1), (3, 2), (10, 9)):
        assert set(box_resize_gray(const, 7, 5, tw, th)) == {77}
    # 1x1 upscaled: every output pixel is the source pixel
    assert box_resize_gray(bytes([123]), 1, 1, 3, 3) == bytes([123] * 9)


def test_non_divisor_golden_fractional_overlap():
    # 3x1 -> 2x1: target 0 covers pixel0 + half of pixel1 (weights 2,1
    # on the 1/2 subgrid), denominator w*h = 3
    img = bytes([30, 60, 90])
    out = box_resize_gray(img, 3, 1, 2, 1)
    assert list(out) == [(30 * 2 + 60 * 1) // 3, (60 * 1 + 90 * 2) // 3]


@pytest.mark.parametrize("seed", range(10))
def test_random_vs_fraction_model(seed):
    """Exact-rational reference model: same spans, Fraction math —
    the integer implementation must floor the same value."""
    rnd = random.Random(9400 + seed)
    w, h = rnd.randint(1, 12), rnd.randint(1, 12)
    tw, th = rnd.randint(1, 12), rnd.randint(1, 12)
    img = bytes(rnd.randrange(256) for _ in range(w * h))
    got = box_resize_gray(img, w, h, tw, th)

    def overlap(lo, hi, s, tn):
        return max(0, min(hi, (s + 1) * tn) - max(lo, s * tn))

    for ty in range(th):
        for tx in range(tw):
            acc = Fraction(0)
            for sy in range(h):
                wy = overlap(ty * h, (ty + 1) * h, sy, th)
                if not wy:
                    continue
                for sx in range(w):
                    wx = overlap(tx * w, (tx + 1) * w, sx, tw)
                    if wx:
                        acc += img[sy * w + sx] * wx * wy
            assert got[ty * tw + tx] == int(acc / (w * h))
    # total-brightness conservation (area-true): sum(out)*in_area ≈
    # sum(in)*out_area within the floor losses (< out pixel count)
    lo = sum(img) * tw * th - w * h * (tw * th)
    assert lo <= sum(got) * w * h <= sum(img) * tw * th


def test_mismatched_sizes_are_loud():
    with pytest.raises(ValueError, match="need 6 gray bytes"):
        box_resize_gray(b"12345", 3, 2, 1, 1)
    with pytest.raises(ValueError, match="positive"):
        box_resize_gray(b"", 0, 1, 1, 1)
    with pytest.raises(ValueError, match="positive"):
        box_resize_gray(b"x", 1, 1, 1, 0)
