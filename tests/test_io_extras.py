"""IO extras: gzipped inputs, BAM round trip through the record reader."""

import gzip

import numpy as np

from floxer_tpu.io.sequence_io import Queries, read_references


def test_gzipped_fasta_and_fastq(tmp_path):
    fasta = tmp_path / "ref.fasta.gz"
    with gzip.open(fasta, "wt") as handle:
        handle.write(">chr1 some description\nACGTACGT\nACGT\n")
    refs = read_references(fasta)
    assert refs.records[0].id == "chr1"
    assert refs.records[0].rank_sequence.tolist() == [
        1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4
    ]
    assert refs.total_sequence_length == 12

    fastq = tmp_path / "reads.fq.gz"
    with gzip.open(fastq, "wt") as handle:
        handle.write("@r1\nACGT\n+\nIIII\n@r2\nTTTT\n+\nJJJJ\n")
    queries = list(Queries(fastq, 1, None, 0))
    assert [q.id for q in queries] == ["r1", "r2"]
    assert queries[1].quality == "JJJJ"


def test_bam_write_read_roundtrip(tmp_path):
    from floxer_tpu.io.sam import (
        AlignmentOutput,
        SamRecord,
        read_alignment_records,
    )
    from floxer_tpu.verify import ReferenceRecord

    refs = [ReferenceRecord("chrA", np.ones(50, dtype=np.uint8), 0)]
    path = tmp_path / "x.bam"
    out = AlignmentOutput(path, refs)
    out.write_record(
        SamRecord(
            qname="readX",
            flag=16,
            rname="chrA",
            pos=7,
            mapq=255,
            cigar=[(3, "="), (1, "I"), (2, "X")],
            seq="ACGTAC",
            qual="IIIIII",
            tags=[("NM", "i", 3)],
        )
    )
    out.close()

    records = list(read_alignment_records(path))
    assert len(records) == 1
    record = records[0]
    assert record["qname"] == "readX"
    assert record["flag"] == 16
    assert record["rname"] == "chrA"
    assert record["pos"] == 7
    assert record["cigar"] == "3=1I2X"
    assert record["seq"] == "ACGTAC"
    assert record["qual"] == "IIIIII"
    assert record["tags"]["NM"] == 3


def test_cigar_container_matches_tuple_list():
    """The run-length Cigar container is interchangeable with the plain
    list[(count, op)] representation everywhere a record can carry either."""
    import numpy as np

    from floxer_tpu.cigar import Cigar

    counts = np.array([4, 1, 2, 3], dtype=np.int64)
    ops = np.frombuffer(b"=XID", dtype=np.uint8)
    cigar = Cigar(counts, ops)
    assert cigar.string() == "4=1X2I3D"
    assert list(cigar) == [(4, "="), (1, "X"), (2, "I"), (3, "D")]
    assert cigar == [(4, "="), (1, "X"), (2, "I"), (3, "D")]
    assert len(cigar) == 4
    assert cigar[1] == (1, "X")
    assert cigar.consumed_reference_bases() == 4 + 1 + 3  # I consumes none
    empty = Cigar(np.zeros(0, np.int64), np.zeros(0, np.uint8))
    assert not empty and len(empty) == 0 and empty.string() == ""


def test_bam_record_identical_for_cigar_and_list(tmp_path):
    """BAM encoding is byte-identical whether the record carries a Cigar
    container (vectorized packing) or the plain tuple list (scalar path)."""
    import numpy as np

    from floxer_tpu.cigar import Cigar
    from floxer_tpu.io.sam import AlignmentOutput, SamRecord

    tuples = [(5, "="), (1, "X"), (2, "I"), (4, "="), (1, "D"), (3, "=")]
    counts = np.array([n for n, _ in tuples], dtype=np.int64)
    ops = np.frombuffer(
        "".join(op for _, op in tuples).encode(), dtype=np.uint8
    )

    def encode(cigar):
        writer = AlignmentOutput.__new__(AlignmentOutput)
        writer._ref_index = {"ref": 0}
        writer._is_bam = True
        record = SamRecord(
            qname="q1", flag=0, rname="ref", pos=7, mapq=255,
            cigar=cigar, seq="ACGTACGTACGTACG", qual="I" * 15,
            tags=[("NM", "i", 2)],
        )
        return writer._encode_bam_record(record)

    assert encode(tuples) == encode(Cigar(counts, ops))


def test_native_traceback_returns_cigar_container():
    import numpy as np

    from floxer_tpu.cigar import Cigar
    from floxer_tpu.native import native_banded_traceback
    from floxer_tpu.ops import dp_reference

    rng = np.random.default_rng(3)
    for _ in range(25):
        n = int(rng.integers(30, 400))
        m = int(rng.integers(10, n))
        ref = rng.integers(1, 5, size=n).astype(np.uint8)
        start = int(rng.integers(0, n - m))
        query = ref[start : start + m].copy()
        for _ in range(int(rng.integers(0, 6))):
            pos = int(rng.integers(0, m))
            query[pos] = ((query[pos] + 1) % 4) + 1
        dp = dp_reference.semi_global_dp_matrix(ref, query)
        last = dp[-1]
        end_col = dp_reference._rightmost_argmin(last)
        distance = int(last[end_col])
        begin_oracle, cigar_oracle = dp_reference._traceback(
            dp, ref, query, end_col
        )
        native = native_banded_traceback(ref, query, end_col, distance)
        if native is None:
            import pytest

            pytest.skip("native library unavailable")
        begin, cigar = native
        assert begin == begin_oracle
        assert isinstance(cigar, Cigar)
        assert cigar == cigar_oracle
        assert cigar.string() == "".join(
            f"{c}{op}" for c, op in cigar_oracle
        )
