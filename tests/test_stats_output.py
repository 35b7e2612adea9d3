"""Statistics histograms/TOML and SAM record-building semantics."""

import numpy as np

from floxer_tpu.io.sam import FLAG_REVERSE, FLAG_SECONDARY, FLAG_UNMAPPED
from floxer_tpu.io.sequence_io import QueryRecord
from floxer_tpu.ops.dp_reference import Orientation, QueryAlignment
from floxer_tpu.stats import SearchAndAlignmentStatistics, linear_range
from floxer_tpu.utils.mathutils import INT32_MAX
from floxer_tpu.verify import QueryAlignments, ReferenceRecord


class RecordingOutput:
    def __init__(self):
        self.records = []

    def write_record(self, record):
        self.records.append(record)


def _query(seq="ACGT"):
    from floxer_tpu.alphabet import chars_to_ranks, reverse_complement

    ranks = chars_to_ranks(seq)
    return QueryRecord("q1", ranks, reverse_complement(ranks), "IIII", 0)


def _refs():
    return [
        ReferenceRecord("r0", np.ones(100, dtype=np.uint8), 0),
        ReferenceRecord("r1", np.ones(50, dtype=np.uint8), 1),
    ]


def test_primary_secondary_and_flags():
    from floxer_tpu.output import write_alignments_for_query

    alignments = QueryAlignments(2)
    # reference 1 holds the BEST alignment, but reference 0 iterates first;
    # primary = first record whose errors == best (output.cpp:57-93)
    alignments.insert(
        QueryAlignment(10, 2, Orientation.FORWARD, [(4, "=")]), 0
    )
    alignments.insert(
        QueryAlignment(20, 1, Orientation.REVERSE_COMPLEMENT, [(4, "=")]), 1
    )
    out = RecordingOutput()
    write_alignments_for_query(out, _query(), alignments, _refs())

    assert len(out.records) == 2
    first, second = out.records
    # the ref-0 record has 2 errors != best (1) -> secondary, empty SEQ
    assert first.flag & FLAG_SECONDARY
    assert first.seq == ""
    assert first.rname == "r0"
    # the ref-1 record is primary: forward SEQ + QUAL, reverse flag
    assert second.flag & FLAG_REVERSE
    assert not second.flag & FLAG_SECONDARY
    assert second.seq == "ACGT"
    assert second.qual == "IIII"
    assert second.tags == [("NM", "i", 1)]


def test_unmapped_record():
    from floxer_tpu.output import write_alignments_for_query

    out = RecordingOutput()
    write_alignments_for_query(out, _query(), QueryAlignments(2), _refs())
    assert len(out.records) == 1
    record = out.records[0]
    assert record.flag == FLAG_UNMAPPED
    assert record.rname == ""
    assert record.seq == "ACGT"
    assert record.qual == "IIII"


def test_position_saturation():
    from floxer_tpu.output import write_alignments_for_query

    alignments = QueryAlignments(2)
    alignments.insert(
        QueryAlignment(2**40, 0, Orientation.FORWARD, [(4, "=")]), 0
    )
    out = RecordingOutput()
    write_alignments_for_query(out, _query(), alignments, _refs())
    assert out.records[0].pos == INT32_MAX


def test_linear_range():
    assert linear_range(5, 100) == [0, 20, 40, 60, 80]


def test_histogram_binning_and_toml():
    stats = SearchAndAlignmentStatistics("simulated")
    for value in (0, 1, 5, 10_000, 99):
        stats.add_query_length(value)
    histogram = stats.histograms["query lengths"]
    assert histogram.num_values == 5
    assert histogram.min_value == 0
    assert histogram.max_value == 10_000
    toml = stats.format_as_toml()
    assert "completely_excluded_queries = 0" in toml
    assert "[query_lengths]" in toml
    assert "mean = 2021.00" in toml


def test_stats_merge():
    a = SearchAndAlignmentStatistics()
    b = SearchAndAlignmentStatistics()
    a.add_query_length(10)
    b.add_query_length(30)
    b.increment_num_completely_excluded_queries()
    a.merge_other_into_this(b)
    assert a.num_queries() == 2
    assert a.counts["completely excluded queries"] == 1
    assert a.histograms["query lengths"].max_value == 30


def test_terminal_format_matches_reference_layout():
    stats = SearchAndAlignmentStatistics()
    stats.add_query_length(42)
    lines = stats.format_for_terminal()
    assert lines[0] == "number of completely excluded queries: 0"
    query_lengths = next(l for l in lines if "query lengths" in l)
    assert query_lengths.startswith("histogram for query lengths (total: 1)")
    assert "threshold:" in query_lengths
    assert "min = 42, mean = 42.00, max = 42" in query_lengths


def test_toml_key_set_matches_reference_names():
    """Golden key-set parity: the TOML dump's counter key and histogram
    table names must be exactly the reference's declared names with
    spaces replaced by underscores (statistics.hpp:72-101 declaration
    order, statistics.cpp:67-70/128-131 underscoring)."""
    import re

    reference_names = [
        "completely excluded queries",
        "query lengths",
        "seed lengths",
        "errors per seed",
        "seeds per query",
        "fully excluded seeds per query",
        "kept anchors per query",
        "excluded raw anchors by soft cap per query",
        "excluded raw anchors by erase useless per query",
        "kept anchors per kept seed",
        "excluded raw anchors by soft cap per kept seed",
        "excluded raw anchors by erase useless per kept seed",
        "reference span sizes aligned of inner nodes",
        "reference span sizes aligned of roots",
        "reference span sizes alignment avoided of roots",
        "alignments per query",
        "alignments edit distance",
        "milliseconds spent in search per query",
        "milliseconds spent in verification per query",
    ]
    expected_counter = reference_names[0].replace(" ", "_")
    expected_tables = [n.replace(" ", "_") for n in reference_names[1:]]

    stats = SearchAndAlignmentStatistics()
    toml = stats.format_as_toml()
    prefix = toml.split("[", 1)[0]
    counters = re.findall(r"^([a-z_]+) = \d+$", prefix, flags=re.MULTILINE)
    tables = re.findall(r"^\[([a-z_]+)\]$", toml, flags=re.MULTILINE)
    assert counters == [expected_counter]
    assert tables == expected_tables
