"""Compare the alignment output of two read mappers (e.g. minimap2 vs floxer).

Parity target: src/main/compare_aligner_outputs.cpp — mapped/unmapped
contingency, per-query classification of the best alignment (basic /
high-edit-distance / significantly-clipped / chimeric-or-inversion,
compare_aligner_outputs.cpp:204-290), CIGAR-derived consumed-bases
accounting (compare_aligner_outputs.cpp:385-423), minimap 'tp:A:I' inversion
tag handling, TOML-ish stats output with the same section names.
"""

from __future__ import annotations

import argparse
import math
import sys
from dataclasses import dataclass, field


def get_max_edit_distance(sequence_length: int, error_rate: float) -> int:
    """compare_aligner_outputs.cpp:30-40 (epsilon-corrected ceil)."""
    num_errors_frac = sequence_length * error_rate
    epsilon = 1e-9
    if abs(num_errors_frac - round(num_errors_frac)) < epsilon:
        return int(round(num_errors_frac) + epsilon)
    return int(math.ceil(num_errors_frac))


@dataclass
class AlignmentRecord:
    num_query_bases_consumed_by_cigar: int
    num_unclipped_query_bases_consumed_by_cigar: int
    num_reference_bases_consumed_by_cigar: int
    num_soft_clipped_bases: int
    num_hard_clipped_bases: int
    query_length_without_clipped_bases: int
    edit_distance: int
    edit_distance_error_rate: float
    is_inversion: bool
    longest_indel: int

    def num_clipped_bases(self) -> int:
        return self.num_soft_clipped_bases + self.num_hard_clipped_bases

    def is_high_edit_distance(self, error_rate: float) -> bool:
        return self.edit_distance > get_max_edit_distance(
            self.query_length_without_clipped_bases, error_rate
        )

    def is_significantly_clipped(self, error_rate: float) -> bool:
        errors_left = get_max_edit_distance(
            self.num_unclipped_query_bases_consumed_by_cigar, error_rate
        ) - self.edit_distance
        return not self.is_high_edit_distance(error_rate) and int(
            self.num_clipped_bases() * 0.75
        ) > errors_left


@dataclass
class AlignmentDataForQuery:
    is_mapped: bool = False
    is_explicitly_unmapped: bool = False
    primary_alignment: AlignmentRecord | None = None
    supplementary_alignments: list = field(default_factory=list)
    secondary_linear_basic_alignments: list = field(default_factory=list)
    secondary_linear_high_edit_distance_alignments: list = field(
        default_factory=list
    )
    secondary_linear_clipped_alignments: list = field(default_factory=list)
    secondary_inverted_alignments: list = field(default_factory=list)
    secondary_supplementary_alignments: list = field(default_factory=list)

    def is_multiple_mapping(self) -> bool:
        return self.is_mapped and bool(
            self.secondary_linear_basic_alignments
            or self.secondary_linear_clipped_alignments
            or self.secondary_linear_high_edit_distance_alignments
            or self.secondary_inverted_alignments
        )

    def has_primary_chimeric(self) -> bool:
        return self.is_mapped and bool(self.supplementary_alignments)

    def has_primary_inversion(self) -> bool:
        return self.is_mapped and self.primary_alignment.is_inversion

    def has_primary_linear(self) -> bool:
        return (
            self.is_mapped
            and not self.has_primary_chimeric()
            and not self.has_primary_inversion()
        )

    def has_primary_linear_basic(self, error_rate: float) -> bool:
        return (
            self.has_primary_linear()
            and not self.primary_alignment.is_high_edit_distance(error_rate)
            and not self.primary_alignment.is_significantly_clipped(error_rate)
        )

    def has_basic(self, error_rate: float) -> bool:
        return self.has_primary_linear_basic(error_rate) or bool(
            self.secondary_linear_basic_alignments
        )

    def best_is_high_edit_distance(self, error_rate: float) -> bool:
        if self.has_basic(error_rate):
            return False
        return (
            self.has_primary_linear()
            and self.primary_alignment.is_high_edit_distance(error_rate)
            and not self.primary_alignment.is_significantly_clipped(error_rate)
        ) or bool(self.secondary_linear_high_edit_distance_alignments)

    def best_is_significantly_clipped(self, error_rate: float) -> bool:
        if self.has_basic(error_rate) or self.best_is_high_edit_distance(
            error_rate
        ):
            return False
        return self.has_primary_linear() or bool(
            self.secondary_linear_clipped_alignments
        )

    def best_is_chimeric_or_inversion(self, error_rate: float) -> bool:
        return (
            self.is_mapped
            and not self.has_basic(error_rate)
            and not self.best_is_high_edit_distance(error_rate)
            and not self.best_is_significantly_clipped(error_rate)
        )

    def basic_error_rate(self, error_rate: float) -> float:
        if self.has_primary_linear_basic(error_rate):
            return self.primary_alignment.edit_distance_error_rate
        records = self.secondary_linear_basic_alignments
        return sum(r.edit_distance_error_rate for r in records) / len(records)

    def basic_longest_indel(self, error_rate: float) -> float:
        if self.has_primary_linear_basic(error_rate):
            return self.primary_alignment.longest_indel
        records = self.secondary_linear_basic_alignments
        return sum(r.longest_indel for r in records) / len(records)


@dataclass
class QueryData:
    mentioned_by_floxer: bool = False
    mentioned_by_minimap: bool = False
    floxer_alignments: AlignmentDataForQuery = field(
        default_factory=AlignmentDataForQuery
    )
    minimap_alignments: AlignmentDataForQuery = field(
        default_factory=AlignmentDataForQuery
    )

    def is_unmapped_floxer(self):
        return self.floxer_alignments.is_explicitly_unmapped

    def is_unmapped_minimap(self):
        return self.minimap_alignments.is_explicitly_unmapped


def _parse_cigar(cigar: str):
    out = []
    count = ""
    for ch in cigar:
        if ch.isdigit():
            count += ch
        else:
            out.append((int(count), ch))
            count = ""
    return out


def read_alignments(path, query_data_by_id, is_floxer: bool, error_rate: float):
    """compare_aligner_outputs.cpp:345-511. Accepts SAM or BAM."""
    from ..io.sam import read_alignment_records

    for record in read_alignment_records(path):
        query_id = record["qname"]
        flag = record["flag"]
        cigar = record["cigar"]

        query_data = query_data_by_id.setdefault(query_id, QueryData())
        data = (
            query_data.floxer_alignments
            if is_floxer
            else query_data.minimap_alignments
        )
        if is_floxer:
            query_data.mentioned_by_floxer = True
        else:
            query_data.mentioned_by_minimap = True

        if flag & 4:
            data.is_explicitly_unmapped = True
            continue
        data.is_mapped = True

        q_consumed = unclipped_q = ref_consumed = 0
        soft = hard = longest_indel = 0
        if cigar != "*":
            for count, op in _parse_cigar(cigar):
                if op in "IM=X":
                    q_consumed += count
                    unclipped_q += count
                if op in "DM=X":
                    ref_consumed += count
                if op == "S":
                    q_consumed += count
                    soft += count
                if op == "H":
                    hard += count
                if op in "ID":
                    longest_indel = max(longest_indel, count)

        tags = record["tags"]
        edit_distance = int(tags.get("NM", 0))
        query_len_unclipped = q_consumed - soft
        error_rate_observed = (
            edit_distance / query_len_unclipped if query_len_unclipped else 0.0
        )
        extracted = AlignmentRecord(
            num_query_bases_consumed_by_cigar=q_consumed,
            num_unclipped_query_bases_consumed_by_cigar=unclipped_q,
            num_reference_bases_consumed_by_cigar=ref_consumed,
            num_soft_clipped_bases=soft,
            num_hard_clipped_bases=hard,
            query_length_without_clipped_bases=query_len_unclipped,
            edit_distance=edit_distance,
            edit_distance_error_rate=error_rate_observed,
            is_inversion=tags.get("tp") == "I",
            longest_indel=longest_indel,
        )

        if not flag & 256 and not flag & 2048:
            if data.primary_alignment is None:
                data.primary_alignment = extracted
            else:
                print(
                    "Multiple primary alignments for query", file=sys.stderr
                )
            continue
        if flag & 2048:
            if flag & 256:
                data.secondary_supplementary_alignments.append(extracted)
            data.supplementary_alignments.append(extracted)
            continue
        if extracted.is_inversion:
            data.secondary_inverted_alignments.append(extracted)
        elif extracted.is_significantly_clipped(error_rate):
            data.secondary_linear_clipped_alignments.append(extracted)
        elif extracted.is_high_edit_distance(error_rate):
            data.secondary_linear_high_edit_distance_alignments.append(extracted)
        else:
            data.secondary_linear_basic_alignments.append(extracted)


def print_alignment_statistics(title, num_queries, error_rate, alignments):
    print(f"[{title}]")
    counts = dict(
        chimeric_or_inversion=0,
        clipped=0,
        high_edit=0,
        basic=0,
        multiple=0,
    )
    longest_indel_sum = 0.0
    error_rate_sum = 0.0
    subset = 0
    for data in alignments:
        if data.best_is_chimeric_or_inversion(error_rate):
            counts["chimeric_or_inversion"] += 1
        if data.best_is_significantly_clipped(error_rate):
            counts["clipped"] += 1
        if data.best_is_high_edit_distance(error_rate):
            counts["high_edit"] += 1
        if data.has_basic(error_rate):
            error_rate_sum += data.basic_error_rate(error_rate)
            longest_indel_sum += data.basic_longest_indel(error_rate)
            counts["basic"] += 1
        if data.is_multiple_mapping():
            counts["multiple"] += 1
        subset += 1
    print(f"num_queries = {subset}")
    print(f"num_best_chimeric_or_inversion = {counts['chimeric_or_inversion']}")
    print(f"num_best_significantly_clipped = {counts['clipped']}")
    print(f"num_best_high_edit_distance = {counts['high_edit']}")
    print(f"num_basic = {counts['basic']}")
    print(f"multiple_mapping = {counts['multiple']}")
    basic = counts["basic"] or float("nan")
    print(f"basic_average_longest_indel = {longest_indel_sum / basic}")
    print(f"basic_alignments_average_error_rate = {error_rate_sum / basic}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="compare_aligner_outputs",
        description="Compares the alignment output of two readmappers "
        "regarding alignments found, edit distance and large indels.",
    )
    parser.add_argument(
        "-r", "--reference", required=True,
        help="The sam file of the reference read mapper (e.g. minimap2).",
    )
    parser.add_argument(
        "-n", "--new", dest="new_path", required=True,
        help="The sam file of the new read mapper (e.g. floxer).",
    )
    parser.add_argument("-e", "--error-rate", type=float, default=0.1)
    args = parser.parse_args(argv)

    query_data: dict[str, QueryData] = {}
    read_alignments(args.reference, query_data, False, args.error_rate)
    read_alignments(args.new_path, query_data, True, args.error_rate)

    num_queries = len(query_data)
    num_unmapped_floxer = sum(
        1 for q in query_data.values() if q.is_unmapped_floxer()
    )
    num_unmapped_minimap = sum(
        1 for q in query_data.values() if q.is_unmapped_minimap()
    )
    num_both_mapped = sum(
        1
        for q in query_data.values()
        if not q.is_unmapped_floxer() and not q.is_unmapped_minimap()
    )
    num_both_unmapped = sum(
        1
        for q in query_data.values()
        if q.is_unmapped_floxer() and q.is_unmapped_minimap()
    )
    num_floxer_only_unmapped = sum(
        1
        for q in query_data.values()
        if q.is_unmapped_floxer() and not q.is_unmapped_minimap()
    )
    num_minimap_only_unmapped = sum(
        1
        for q in query_data.values()
        if q.is_unmapped_minimap() and not q.is_unmapped_floxer()
    )

    print("[general_stats]")
    print(f"number_of_queries = {num_queries}")
    print(f"both_mapped = {num_both_mapped}")
    print(f"both_unmapped = {num_both_unmapped}")
    print(f"floxer_mapped = {num_queries - num_unmapped_floxer}")
    print(f"floxer_unmapped = {num_unmapped_floxer}")
    print(f"minimap_mapped = {num_queries - num_unmapped_minimap}")
    print(f"minimap_unmapped = {num_unmapped_minimap}")
    print(f"floxer_unmapped_and_minimap_mapped = {num_floxer_only_unmapped}")
    print(f"minimap_unmapped_and_floxer_mapped = {num_minimap_only_unmapped}")

    print_alignment_statistics(
        "floxer_stats_if_floxer_mapped",
        num_queries,
        args.error_rate,
        (
            q.floxer_alignments
            for q in query_data.values()
            if not q.is_unmapped_floxer()
        ),
    )
    print_alignment_statistics(
        "minimap_stats_if_minimap_mapped",
        num_queries,
        args.error_rate,
        (
            q.minimap_alignments
            for q in query_data.values()
            if not q.is_unmapped_minimap()
        ),
    )
    print_alignment_statistics(
        "minimap_stats_if_both_mapped",
        num_queries,
        args.error_rate,
        (
            q.minimap_alignments
            for q in query_data.values()
            if not q.is_unmapped_floxer() and not q.is_unmapped_minimap()
        ),
    )
    print_alignment_statistics(
        "minimap_stats_if_only_minimap_mapped",
        num_queries,
        args.error_rate,
        (
            q.minimap_alignments
            for q in query_data.values()
            if q.is_unmapped_floxer() and not q.is_unmapped_minimap()
        ),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
