"""Parity with reference test/input_test.cpp."""

import numpy as np

from floxer_tpu.alphabet import chars_to_ranks, ranks_to_chars, reverse_complement
from floxer_tpu.io.sequence_io import extract_record_id


def test_extract_record_id():
    record_id = "kcmieo25789377djs28"
    assert extract_record_id(record_id + " metadata") == record_id


def test_chars_to_rank_sequence_simple():
    assert chars_to_ranks("ACGTacgt").tolist() == [1, 2, 3, 4, 1, 2, 3, 4]


def test_chars_to_rank_sequence_sentinel():
    assert chars_to_ranks("ACGTacgt$").tolist() == [1, 2, 3, 4, 1, 2, 3, 4, 0]


def test_chars_to_rank_sequence_invalid_chars():
    # 'U' becomes 4 just like 'T' (ivsigma behavior preserved)
    assert chars_to_ranks("ACGTacgtW3>").tolist() == [1, 2, 3, 4, 1, 2, 3, 4, 5, 5, 5]
    assert chars_to_ranks("UuN").tolist() == [4, 4, 5]


def test_ranks_to_chars_roundtrip():
    assert ranks_to_chars(np.array([1, 2, 3, 4, 5, 0], dtype=np.uint8)) == "ACGTN$"


def test_reverse_complement():
    ranks = chars_to_ranks("AACGTN")
    assert ranks_to_chars(reverse_complement(ranks)) == "NACGTT"
