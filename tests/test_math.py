"""Parity with reference test/math_test.cpp."""

from floxer_tpu.utils.mathutils import (
    INT32_MAX,
    ceil_div,
    float_aware_ceil,
    saturate_to_int32_max,
)


def test_saturate_value_to_int32_max():
    assert saturate_to_int32_max(42) == 42
    assert saturate_to_int32_max(2**64 - 1) == INT32_MAX


def test_ceil_div():
    assert ceil_div(100, 8) == 13
    assert ceil_div(100, 5) == 20


def test_floating_point_error_aware_ceil():
    assert float_aware_ceil(3.0) == 3
    assert float_aware_ceil(500 * 0.01) == 5
    assert float_aware_ceil(100 * 0.07) == 7
    assert float_aware_ceil(123.456) == 124
