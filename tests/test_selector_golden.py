"""Selector/codec goldens on the seeded sf0.001 fixture.

codec_histogram and compression_summary are rows-only in the driver
compare forever (engine-internal codec tags and byte counts have no SQL
equivalent), so regressions there would otherwise be invisible: these
goldens pin the EXACT codec choices and compressed sizes the graded
queries report.  If the auto-selector's cost model, a kernel's output
bytes, or the chunking changes, this test breaks loudly -- re-pin the
constants only after confirming the drift is intentional.
"""
from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

# value goldens as of round 4 (see git blame for the producing commit)
GOLDEN_HISTOGRAM = [
    # (tokens_codec, source_codec, doc_id_codec, n_chunks)
    ("offsets:DELTA_BP|values:DICT", "DICT", "DELTA_BA", 8),
]
GOLDEN_SUMMARY = {
    "bytes_in": 130756,
    "bytes_out": 22702,
    "n_tokens": 27939,
    "n_chunks": 8,
}


def test_codec_histogram_golden(spark):
    import __spark_entry__ as entry

    got = sorted(tuple(r) for r in
                 entry.queries()["codec_histogram"](spark, SF_DIR).collect())
    assert got == GOLDEN_HISTOGRAM


def test_compression_summary_golden(spark):
    import __spark_entry__ as entry

    row = entry.queries()["compression_summary"](spark, SF_DIR).collect()
    assert len(row) == 1
    assert row[0].asDict() == GOLDEN_SUMMARY
