"""Parity with reference test/alignment_test.cpp and verification_test.cpp."""

import numpy as np

from floxer_tpu.intervals import VerifiedIntervals
from floxer_tpu.ops.dp_reference import (
    AlignmentMode,
    Orientation,
    align_semi_global,
)
from floxer_tpu.pex import BuildStrategy, PexNode, build_pex_tree, NULL_ID
from floxer_tpu.search_host import Anchor
from floxer_tpu.verify import (
    QueryAlignments,
    QueryVerifier,
    ReferenceRecord,
    SpanConfig,
    VerificationKind,
    compute_reference_span,
)

REFERENCE_100 = np.array(
    [
        4, 2, 3, 4, 3, 4, 4, 4, 3, 2,
        4, 3, 3, 2, 2, 3, 4, 4, 3, 3,
        4, 3, 2, 2, 1, 4, 3, 3, 4, 2,
        4, 4, 4, 3, 3, 2, 1, 1, 1, 2,
        3, 4, 4, 3, 2, 4, 4, 2, 1, 4,
        4, 3, 4, 4, 4, 4, 3, 3, 2, 1,  # query
        2, 3, 4, 3, 2, 1, 2, 3, 4, 3,  # query
        1, 4, 2, 1, 4, 4, 2, 2, 3, 4,  # query
        3, 3, 2, 1, 4, 4, 1, 1, 1, 2,
        4, 3, 2, 1, 2, 2, 2, 3, 3, 1,
    ],
    dtype=np.uint8,
)


def test_small_alignment():
    reference = np.array([0, 0, 1, 2, 1, 3, 0, 2, 2, 3, 0, 1], dtype=np.uint8)
    query = np.array([1, 2, 1, 3, 1, 2, 2], dtype=np.uint8)
    result = align_semi_global(
        reference, query, 2, Orientation.FORWARD, AlignmentMode.WITH_CIGAR, 0
    )
    assert result.exists
    alignment = result.alignment
    assert alignment.num_errors == 1
    assert alignment.orientation == Orientation.FORWARD
    assert alignment.start_in_reference == 2
    assert alignment.cigar_string() == "4=1X2="


def test_verify_hierarchical():
    """verification_test.cpp:11-123."""
    reference = ReferenceRecord("", REFERENCE_100, 0)
    query = np.array(
        list(REFERENCE_100[50:60]) + [4]  # insertion at end
        + list(REFERENCE_100[60:69])  # deletion at end
        + list(REFERENCE_100[70:80]),
        dtype=np.uint8,
    )
    tree = build_pex_tree(len(query), 5, 1, BuildStrategy.BOTTOM_UP)
    anchor = Anchor(
        pex_leaf_index=0, reference_id=0, reference_position=50, num_errors=0
    )
    ivls = VerifiedIntervals(active=True)
    alignments = QueryAlignments(1)

    def make_verifier(kind, intervals, target):
        return QueryVerifier(
            pex_tree=tree,
            anchor=anchor,
            pex_leaf_node=tree.leaves[0],
            query=query,
            orientation=Orientation.REVERSE_COMPLEMENT,
            reference=reference,
            kind=kind,
            already_verified_intervals=intervals,
            extra_verification_ratio=0.1,
            without_cigar=False,
            alignments=target,
        )

    make_verifier(VerificationKind.HIERARCHICAL, ivls, alignments).verify()

    assert alignments.size() == 1
    alignment = alignments.per_reference[0][0]
    assert alignment.cigar_string() == "10=1I9=1D10="
    assert alignment.num_errors == 2
    assert alignment.orientation == Orientation.REVERSE_COMPLEMENT
    assert alignment.start_in_reference == 50

    # nothing changes: the interval cache suppresses the re-verification
    make_verifier(VerificationKind.HIERARCHICAL, ivls, alignments).verify()
    assert alignments.size() == 1

    # direct full verification with a deactivated cache adds a duplicate
    off_ivls = VerifiedIntervals(active=False)
    make_verifier(VerificationKind.DIRECT_FULL, off_ivls, alignments).verify()
    assert alignments.size() == 2
    assert (
        alignments.per_reference[0][1].cigar_string()
        == alignments.per_reference[0][0].cigar_string()
    )
    assert (
        alignments.per_reference[0][1].start_in_reference
        == alignments.per_reference[0][0].start_in_reference
    )

    # too many errors -> no new alignment
    bad_query = query.copy()
    bad_query[5] = 1
    bad_query[6] = 1
    bad_query[11] = 3
    bad_query[20] = 2
    verifier = QueryVerifier(
        pex_tree=tree,
        anchor=anchor,
        pex_leaf_node=tree.leaves[0],
        query=bad_query,
        orientation=Orientation.REVERSE_COMPLEMENT,
        reference=reference,
        kind=VerificationKind.DIRECT_FULL,
        already_verified_intervals=off_ivls,
        extra_verification_ratio=0.1,
        without_cigar=False,
        alignments=alignments,
    )
    verifier.verify()
    assert alignments.size() == 2


def test_compute_reference_span_start_and_length():
    """verification_test.cpp:126-161: the exact span math numbers."""
    anchor = Anchor(
        pex_leaf_index=0,
        reference_id=0,
        reference_position=100_755,
        num_errors=25,
    )
    node = PexNode(
        parent_id=0, query_index_from=500, query_index_to=999, num_errors=30
    )

    base = compute_reference_span(anchor, node, 750, 1_000_000, 0.0)
    assert base.offset == 100_475
    assert base.length == 561
    assert base.applied_extra_verification_length_per_side == 0

    extra = compute_reference_span(anchor, node, 750, 1_000_000, 0.01)
    assert extra.offset == 100_469
    assert extra.length == 573
    assert extra.applied_extra_verification_length_per_side == 6  # ceil(561*0.01)


def test_try_to_align_pex_node_query_with_reference_span():
    """verification_test.cpp:163-261."""
    node = PexNode(
        parent_id=NULL_ID, query_index_from=40, query_index_to=84, num_errors=5
    )
    rank_sequence = np.array(
        [2] * 10 + [1] * 80 + [2] * 10, dtype=np.uint8
    )
    reference = ReferenceRecord("", rank_sequence, 0)
    span = SpanConfig(offset=50, length=50, applied_extra_verification_length_per_side=0)
    query = np.array(
        [1, 1, 1, 3, 1, 1, 1, 1, 1, 1]
        + [1] * 30
        + [1, 1, 1, 1, 1, 1, 1, 1, 1, 3]
        + [1, 4, 1, 1, 1, 2, 1, 1, 1, 1]
        + [1, 1, 1, 3, 1, 1, 1, 4, 1, 1]
        + [1] * 10
        + [1] * 5,
        dtype=np.uint8,
    )
    alignments = QueryAlignments(1)

    verifier = QueryVerifier(
        pex_tree=None,
        anchor=None,
        pex_leaf_node=None,
        query=query,
        orientation=Orientation.FORWARD,
        reference=reference,
        kind=VerificationKind.HIERARCHICAL,
        already_verified_intervals=VerifiedIntervals(active=False),
        extra_verification_ratio=0.0,
        without_cigar=False,
        alignments=alignments,
    )

    assert verifier._try_to_align_node(node, span)
    assert alignments.size() == 1
    alignment = alignments.per_reference[0][0]
    assert alignment.num_errors == 5
    assert alignment.orientation == Orientation.FORWARD
    assert alignment.start_in_reference == 50

    node.parent_id = 0  # not root anymore -> existence only
    assert verifier._try_to_align_node(node, span)
    assert alignments.size() == 1

    query[42] = 2  # too many errors
    assert not verifier._try_to_align_node(node, span)
    assert alignments.size() == 1


def test_without_cigar_mode_reversed_trick():
    reference = np.array([0, 0, 1, 2, 1, 3, 0, 2, 2, 3, 0, 1], dtype=np.uint8)
    query = np.array([1, 2, 1, 3, 1, 2, 2], dtype=np.uint8)
    result = align_semi_global(
        reference, query, 2, Orientation.FORWARD, AlignmentMode.WITHOUT_CIGAR, 0
    )
    assert result.exists
    assert result.alignment.num_errors == 1
    assert result.alignment.start_in_reference == 2
    assert result.alignment.cigar == []


def test_very_large_dp_matrix_warning(caplog):
    """alignment.cpp:81, 149-154 parity: a direct-full verification whose
    estimated DP matrix exceeds 10 GB logs a warning (the banded kernels
    bound memory by construction; only the full-matrix oracle can grow)."""
    import logging

    from floxer_tpu.ops.dp_reference import _warn_if_very_large_dp

    with caplog.at_level(logging.WARNING, logger="floxer-tpu"):
        _warn_if_very_large_dp(100_000, 50_000)  # ~18.6 GiB estimated
    assert any(
        "very large DP matrix" in record.message for record in caplog.records
    )

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="floxer-tpu"):
        _warn_if_very_large_dp(1_000, 500)
    assert not caplog.records
