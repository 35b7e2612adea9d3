"""Parity with reference test/intervals_test.cpp."""

from floxer_tpu.intervals import (
    HalfOpenInterval,
    IntervalRelationship as R,
    VerifiedIntervals,
)

IVL1 = HalfOpenInterval(5, 11)
IVL2 = HalfOpenInterval(15, 21)
IVL3 = HalfOpenInterval(11, 14)
IVL4 = HalfOpenInterval(14, 15)
IVL5 = HalfOpenInterval(0, 100)

INSIDE_IVL1 = HalfOpenInterval(6, 10)
OVERLAPPING_BELOW_IVL1 = HalfOpenInterval(3, 7)
CONTAINING_IVL1 = HalfOpenInterval(3, 14)
OVERLAPPING_BELOW_IVL2 = HalfOpenInterval(13, 18)
OVERLAPPING_ABOVE_IVL2 = HalfOpenInterval(17, 23)
BETWEEN_BOTH = HalfOpenInterval(11, 15)
OVERLAPPING_BOTH = HalfOpenInterval(8, 16)
CONTAINING_BOTH = HalfOpenInterval(3, 30)
BELOW_BOTH = HalfOpenInterval(0, 2)
ABOVE_BOTH = HalfOpenInterval(22, 24)


def test_half_open_interval_relationships():
    assert IVL1.relationship_with(INSIDE_IVL1) == R.CONTAINS
    assert (
        IVL1.relationship_with(OVERLAPPING_BELOW_IVL1)
        == R.OVERLAPPING_OR_TOUCHING_ABOVE
    )
    assert IVL1.relationship_with(CONTAINING_IVL1) == R.INSIDE
    assert IVL1.relationship_with(OVERLAPPING_BELOW_IVL2) == R.COMPLETELY_BELOW
    assert IVL1.relationship_with(OVERLAPPING_ABOVE_IVL2) == R.COMPLETELY_BELOW
    assert IVL1.relationship_with(BETWEEN_BOTH) == R.OVERLAPPING_OR_TOUCHING_BELOW
    assert IVL1.relationship_with(OVERLAPPING_BOTH) == R.OVERLAPPING_OR_TOUCHING_BELOW
    assert IVL1.relationship_with(CONTAINING_BOTH) == R.INSIDE
    assert IVL1.relationship_with(BELOW_BOTH) == R.COMPLETELY_ABOVE
    assert IVL1.relationship_with(ABOVE_BOTH) == R.COMPLETELY_BELOW
    assert IVL1.relationship_with(IVL1) == R.EQUAL

    assert IVL2.relationship_with(INSIDE_IVL1) == R.COMPLETELY_ABOVE
    assert IVL2.relationship_with(OVERLAPPING_BELOW_IVL1) == R.COMPLETELY_ABOVE
    assert IVL2.relationship_with(CONTAINING_IVL1) == R.COMPLETELY_ABOVE
    assert (
        IVL2.relationship_with(OVERLAPPING_BELOW_IVL2)
        == R.OVERLAPPING_OR_TOUCHING_ABOVE
    )
    assert (
        IVL2.relationship_with(OVERLAPPING_ABOVE_IVL2)
        == R.OVERLAPPING_OR_TOUCHING_BELOW
    )
    assert IVL2.relationship_with(BETWEEN_BOTH) == R.OVERLAPPING_OR_TOUCHING_ABOVE
    assert IVL2.relationship_with(OVERLAPPING_BOTH) == R.OVERLAPPING_OR_TOUCHING_ABOVE
    assert IVL2.relationship_with(CONTAINING_BOTH) == R.INSIDE
    assert IVL2.relationship_with(BELOW_BOTH) == R.COMPLETELY_ABOVE
    assert IVL2.relationship_with(ABOVE_BOTH) == R.COMPLETELY_BELOW
    assert IVL2.relationship_with(IVL2) == R.EQUAL


def test_half_open_intervals_trim():
    base = HalfOpenInterval(10, 20)
    assert base.trim_from_both_sides(0) == HalfOpenInterval(10, 20)
    assert base.trim_from_both_sides(1) == HalfOpenInterval(11, 19)
    assert base.trim_from_both_sides(5) == HalfOpenInterval(14, 15)
    assert base.trim_from_both_sides(10) == HalfOpenInterval(10, 11)
    assert base.trim_from_both_sides(25) == HalfOpenInterval(10, 11)


def test_verified_intervals():
    ivls = VerifiedIntervals()
    ivls.insert(IVL1)
    ivls.insert(IVL2)

    assert ivls.contains(IVL1)
    assert ivls.contains(IVL2)

    assert ivls.contains(INSIDE_IVL1)
    for target in (
        OVERLAPPING_BELOW_IVL1,
        CONTAINING_IVL1,
        OVERLAPPING_BELOW_IVL2,
        OVERLAPPING_ABOVE_IVL2,
        BETWEEN_BOTH,
        OVERLAPPING_BOTH,
        CONTAINING_BOTH,
        BELOW_BOTH,
        ABOVE_BOTH,
    ):
        assert not ivls.contains(target)

    ivls.insert(IVL3)
    assert ivls.contains(INSIDE_IVL1)
    for target in (
        OVERLAPPING_BELOW_IVL1,
        CONTAINING_IVL1,
        OVERLAPPING_BELOW_IVL2,
        OVERLAPPING_ABOVE_IVL2,
        BETWEEN_BOTH,
        OVERLAPPING_BOTH,
        CONTAINING_BOTH,
        BELOW_BOTH,
        ABOVE_BOTH,
    ):
        assert not ivls.contains(target)

    ivls.insert(IVL4)
    # touching intervals must NOT merge (regression for a reference bug,
    # intervals_test.cpp:128-132)
    assert ivls.contains(INSIDE_IVL1)
    for target in (
        OVERLAPPING_BELOW_IVL1,
        CONTAINING_IVL1,
        OVERLAPPING_BELOW_IVL2,  # !
        OVERLAPPING_ABOVE_IVL2,
        BETWEEN_BOTH,  # !
        OVERLAPPING_BOTH,  # !
        CONTAINING_BOTH,
        BELOW_BOTH,
        ABOVE_BOTH,
    ):
        assert not ivls.contains(target)

    ivls.insert(IVL5)
    for target in (
        INSIDE_IVL1,
        OVERLAPPING_BELOW_IVL1,
        CONTAINING_IVL1,
        OVERLAPPING_BELOW_IVL2,
        OVERLAPPING_ABOVE_IVL2,
        BETWEEN_BOTH,
        OVERLAPPING_BOTH,
        CONTAINING_BOTH,
        BELOW_BOTH,
        ABOVE_BOTH,
    ):
        assert ivls.contains(target)


def test_verified_intervals_inactive():
    ivls = VerifiedIntervals(active=False)
    ivls.insert(IVL1)
    assert not ivls.contains(IVL1)
