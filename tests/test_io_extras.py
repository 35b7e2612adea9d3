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
