"""WET/WARC crawl-archive source: parser unit tests + distributed parse."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from energy_data_pipeline_spark.functions import text as T
from energy_data_pipeline_spark.jobs.corpus_ingest import corpus_ingest_job
from energy_data_pipeline_spark.sources.wet import (
    parse_wet_records,
    render_wet,
    wet_text_records,
    wet_to_document_batch,
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


def _wet_file(i, texts):
    return (
        f"crawl/shard-{i}.warc.wet.gz",
        bytearray(
            render_wet(
                [
                    {
                        "record_id": f"<urn:uuid:{i}-{j}>",
                        "target_uri": f"https://example.com/{i}/{j}",
                        "warc_date": "2024-01-01T00:00:00Z",
                        "text": t,
                    }
                    for j, t in enumerate(texts)
                ],
                compress=True,
            )
        ),
    )


def test_wet_to_corpus_admission_end_to_end(spark, tmp_path):
    """The crawl front door wired through: WET bytes -> parsed records
    -> document batch -> quality gate + dedup admission; replayed crawl
    files settle to no-ops because the bridge's doc ids and the
    fingerprints are both content-stable."""
    long_a = "the quick brown fox jumps over the lazy dog near the quiet river bank while morning light settles across the open field and birds begin to call"
    long_b = "data pipelines move records from source systems through validation and enrichment before loading them into the warehouse where analysts query daily aggregates"
    raw = spark.createDataFrame(
        [
            _wet_file(0, [long_a, "too short", long_b]),
            _wet_file(1, [long_b, "another tiny one"]),  # cross-file dup text
        ],
        "path string, content binary",
    )
    batch = wet_to_document_batch(wet_text_records(raw))
    assert batch.columns == ["doc_id", "source", "lang", "text"]
    assert batch.count() == 5
    # ids are content-stable: re-parsing yields the identical id set
    again = wet_to_document_batch(wet_text_records(raw))
    assert {r.doc_id for r in batch.collect()} == {
        r.doc_id for r in again.collect()
    }

    # expected gate survivors, computed with the engine's own predicate
    # (gate thresholds are pinned elsewhere; this test pins the PLUMBING)
    n_pass = batch.filter(T.quality_keep("text")).count()
    n_pass_distinct = (
        batch.filter(T.quality_keep("text"))
        .select(T.fingerprint("text").alias("fp"))
        .distinct()
        .count()
    )

    corpus = str(tmp_path / "corpus")
    stats = corpus_ingest_job(batch, corpus, batch_id="crawl-0")
    assert stats["arrived"] == 5
    assert stats["failed_quality"] == 5 - n_pass
    assert stats["admitted"] == n_pass_distinct
    admitted = spark.read.parquet(corpus)
    assert admitted.count() == n_pass_distinct
    assert admitted.filter(F.col("lang").isNull()).count() == 0

    # replayed crawl: same files, same ids, same fingerprints -> no-op
    replay = corpus_ingest_job(batch, corpus, batch_id="crawl-0-retry")
    assert replay["admitted"] == 0
    assert spark.read.parquet(corpus).count() == n_pass_distinct


def test_parse_negative_content_length_cannot_hang():
    """A negative Content-Length must cost one record, never the task:
    the rewind it used to cause looped on the same marker forever."""
    blob = (
        b"X" * 300
        + b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        + b"Content-Length: -100\r\n\r\nbody"
        + render_wet(RECORDS[1:2])
    )
    recs = parse_wet_records(blob)
    assert [r["record_id"] for r in recs] == ["<urn:uuid:a>"]


def test_render_handles_iri_headers():
    """Real crawl URIs are IRIs; render/parse must round-trip non-ASCII
    header values (the parser already decodes headers as UTF-8)."""
    recs = [
        {
            "record_id": "<urn:uuid:café>",
            "target_uri": "https://example.com/café/路径",
            "warc_date": "2024-01-01T00:00:00Z",
            "text": "body",
        }
    ]
    parsed = parse_wet_records(render_wet(recs))
    assert parsed[0]["target_uri"] == "https://example.com/café/路径"
    assert parsed[0]["record_id"] == "<urn:uuid:café>"
