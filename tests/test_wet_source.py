"""WET/WARC crawl-archive source: parser unit tests + distributed parse."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from energy_data_pipeline_spark.sources.wet import (
    parse_wet_records,
    render_wet,
    wet_text_records,
)

RECORDS = [
    {
        "warc_type": "warcinfo",
        "record_id": "<urn:uuid:info>",
        "target_uri": "",
        "warc_date": "2024-01-01T00:00:00Z",
        "text": "software: test-crawler",
    },
    {
        "warc_type": "conversion",
        "record_id": "<urn:uuid:a>",
        "target_uri": "https://example.com/a",
        "warc_date": "2024-01-01T00:00:01Z",
        "text": "hello crawl world\nsecond line",
    },
    {
        "warc_type": "conversion",
        "record_id": "<urn:uuid:b>",
        "target_uri": "https://example.org/b",
        "warc_date": "2024-01-01T00:00:02Z",
        "text": "docuÿment two",  # non-ascii survives the round trip
    },
]


def test_parse_keeps_only_conversion_records():
    recs = parse_wet_records(render_wet(RECORDS))
    assert [r["target_uri"] for r in recs] == [
        "https://example.com/a",
        "https://example.org/b",
    ]
    assert recs[0]["text"] == "hello crawl world\nsecond line"
    assert recs[0]["n_chars"] == len(recs[0]["text"])
    assert recs[1]["text"] == "docuÿment two"


def test_parse_keep_types_none_keeps_all():
    recs = parse_wet_records(render_wet(RECORDS), keep_types=None)
    assert len(recs) == 3
    assert recs[0]["record_id"] == "<urn:uuid:info>"


def test_parse_concatenated_gzip_members():
    data = render_wet(RECORDS, compress=True)
    assert data[:2] == b"\x1f\x8b"
    recs = parse_wet_records(data)
    assert [r["record_id"] for r in recs] == ["<urn:uuid:a>", "<urn:uuid:b>"]


def test_parse_tolerates_garbage_and_truncated_tail():
    good = render_wet(RECORDS[1:2])
    # leading garbage + a record whose declared length overruns the buffer
    truncated = render_wet(RECORDS[2:3])[:-10]
    recs = parse_wet_records(b"junk-bytes" + good + b"noise" + truncated)
    assert len(recs) == 2
    assert recs[0]["text"] == RECORDS[1]["text"]
    assert recs[1]["text"] == RECORDS[2]["text"][:-6]  # truncated, not lost


def test_parse_bad_content_length_skips_record_only():
    blob = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"Content-Length: nonsense\r\n\r\n"
    ) + render_wet(RECORDS[1:2])
    recs = parse_wet_records(blob)
    assert [r["record_id"] for r in recs] == ["<urn:uuid:a>"]


_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(_texts, max_size=6),
    compress=st.booleans(),
)
def test_render_parse_round_trip_property(texts, compress):
    """Any unicode text survives render→parse byte-exactly (the body is
    length-framed, so record-separator-looking content inside a text
    must not split records)."""
    recs = [
        {
            "record_id": f"<urn:uuid:{i}>",
            "target_uri": f"https://example.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "text": t,
        }
        for i, t in enumerate(texts)
    ]
    parsed = parse_wet_records(render_wet(recs, compress=compress))
    assert [r["text"] for r in parsed] == texts
    assert [r["record_id"] for r in parsed] == [
        r["record_id"] for r in recs
    ]


def test_adversarial_payload_containing_record_markers():
    """A text body that CONTAINS a full WET record must not be split:
    Content-Length framing wins over marker scanning."""
    inner = render_wet(
        [
            {
                "record_id": "<urn:uuid:inner>",
                "target_uri": "https://evil.example/x",
                "warc_date": "2024-01-01T00:00:00Z",
                "text": "smuggled",
            }
        ]
    ).decode("ascii")
    recs = [
        {
            "record_id": "<urn:uuid:outer>",
            "target_uri": "https://example.com/outer",
            "warc_date": "2024-01-01T00:00:00Z",
            "text": "prefix " + inner + " suffix",
        },
        {
            "record_id": "<urn:uuid:after>",
            "target_uri": "https://example.com/after",
            "warc_date": "2024-01-01T00:00:00Z",
            "text": "next doc",
        },
    ]
    parsed = parse_wet_records(render_wet(recs))
    assert [r["record_id"] for r in parsed] == [
        "<urn:uuid:outer>",
        "<urn:uuid:after>",
    ]
    assert parsed[0]["text"] == recs[0]["text"]


def test_wet_text_records_distributed(spark):
    rows = [
        ("crawl/part-0.warc.wet.gz", bytearray(render_wet(RECORDS, compress=True))),
        ("crawl/part-1.warc.wet", bytearray(render_wet(RECORDS[1:2]))),
        ("crawl/empty.warc.wet", None),
    ]
    raw = spark.createDataFrame(rows, "path string, content binary")
    out = wet_text_records(raw)
    assert out.columns == [
        "source_file",
        "record_id",
        "target_uri",
        "warc_date",
        "text",
        "n_chars",
    ]
    got = {(r.source_file, r.record_id): r for r in out.collect()}
    assert len(got) == 3  # 2 from the gz file + 1 plain, warcinfo dropped
    a = got[("crawl/part-0.warc.wet.gz", "<urn:uuid:a>")]
    assert a.text == "hello crawl world\nsecond line"
    assert a.n_chars == len(a.text)
