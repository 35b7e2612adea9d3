"""Search scheme completeness and expansion."""

import pytest

from floxer_tpu.schemes import (
    expand_scheme,
    generate_scheme,
    scheme_is_complete,
)


@pytest.mark.parametrize("k", [0, 1, 2, 3, 4, 5])
def test_scheme_completeness(k):
    scheme = generate_scheme(k)
    assert scheme_is_complete(scheme, k)


def test_expand_partition_covers_pattern():
    for k in (0, 1, 2, 3):
        for length in (6, 12, 17, 100):
            searches = expand_scheme(k, length)
            for search in searches:
                spans = sorted(search.part_spans)
                assert spans[0][0] == 0
                assert spans[-1][1] == length
                for (_, end_a), (start_b, _) in zip(spans, spans[1:]):
                    assert end_a == start_b


def test_expand_directions_are_connected():
    for k in (1, 2, 3):
        for search in expand_scheme(k, 30):
            lo, hi = search.pi[0], search.pi[0]
            for j, part in enumerate(search.pi[1:], start=1):
                if search.directions[j] > 0:
                    assert part == hi + 1
                    hi = part
                else:
                    assert part == lo - 1
                    lo = part
