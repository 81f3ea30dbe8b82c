"""WARC/WET crawl-archive source — the 100 TB corpus front door.

Common Crawl publishes extracted-text snapshots as WET files: WARC 1.0
(ISO 28500) record streams where each ``conversion`` record carries one
page's plain text. A crawl snapshot is ~100k gzip files of ~150 MB each
— i.e. exactly the shape Spark's ``binaryFile`` datasource parallelizes
naturally: ONE FILE PER TASK, no shuffle, and the parse is an
Arrow-batched ``mapInPandas`` that never touches Python row-at-a-time.

    raw = spark.read.format("binaryFile").load("s3://.../wet/*.warc.wet.gz")
    docs = wet_text_records(raw)            # (file, uri, date, text, ...)
    corpus_ingest_job(docs...)              # quality gate + dedup admission

The record grammar (version line, CRLF header block, Content-Length
payload, CRLF CRLF gap) and the concatenated-gzip framing are public
spec; the parser is stdlib-only. Malformed tails degrade gracefully: a
record whose declared Content-Length overruns the buffer is truncated,
and garbage between records is skipped by scanning to the next version
marker — at crawl scale a single corrupt member must cost one record,
never one task.

Reference parity: this is the engine's crawl-scale analogue of the
reference's file-shaped ingestion front door (fetch_data/ CSV/XML pulls
feeding initial_db_ingestion.py); same boundary, web-archive format.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WET_SCHEMA = (
    "source_file string, record_id string, target_uri string, "
    "warc_date string, text string, n_chars bigint"
)


def parse_wet_records(
    data: bytes, keep_types: tuple[str, ...] = ("conversion",)
) -> list[dict]:
    """Parse one WET file's bytes into text-record dicts.

    Handles plain or gzip (including multi-member concatenated gzip —
    the Common Crawl framing, one member per record) input. Records
    whose ``WARC-Type`` is not in ``keep_types`` (warcinfo, request,
    metadata...) are skipped; pass ``keep_types=None`` to keep all.
    Payload text is decoded UTF-8 with replacement (crawl text is not
    reliably valid UTF-8)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # concatenated members: all inflated
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # scan to the next version marker (skips inter-record gaps and
        # any garbage a corrupt member left behind)
        idx = data.find(b"WARC/1.", pos)
        if idx < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", idx)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[idx:hdr_end].split(b"\r\n")[1:]:
            name, sep, value = line.partition(b":")
            if sep:
                headers[name.strip().decode("ascii", "replace").lower()] = (
                    value.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        if length < 0:
            # a negative length would rewind pos behind this record's
            # own marker and loop forever; treat like an unparseable one
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]  # overrun → truncated
        pos = body_start + length
        rtype = headers.get("warc-type", "")
        if keep_types is not None and rtype not in keep_types:
            continue
        text = body.decode("utf-8", "replace")
        out.append(
            {
                "record_id": headers.get("warc-record-id", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "text": text,
                "n_chars": len(text),
            }
        )
    return out


def wet_text_records(
    df: DataFrame,
    payload_col: str = "content",
    path_col: str = "path",
    keep_types: tuple[str, ...] = ("conversion",),
) -> DataFrame:
    """Distributed WET parse: (path, content-bytes) rows → one row per
    kept text record.

    Input shape matches ``spark.read.format("binaryFile")`` (``path``,
    ``content``), so a crawl snapshot's file listing IS the task list —
    parallelism is the file count, there is no shuffle, and each task's
    memory is one inflated file. Arrow-batched ``mapInPandas``; the
    output feeds ``jobs/corpus_ingest`` admission unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "source_file",
            "record_id",
            "target_uri",
            "warc_date",
            "text",
            "n_chars",
        ]
        for pdf in batches:
            rows: list[tuple] = []
            for path, payload in zip(pdf[path_col], pdf[payload_col]):
                if payload is None:
                    continue
                for rec in parse_wet_records(bytes(payload), keep_types):
                    rows.append(
                        (
                            path,
                            rec["record_id"],
                            rec["target_uri"],
                            rec["warc_date"],
                            rec["text"],
                            rec["n_chars"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(path_col, payload_col).mapInPandas(run, schema=WET_SCHEMA)


def wet_to_document_batch(df: DataFrame) -> DataFrame:
    """Bridge parsed WET records into ``corpus_ingest_job``'s batch
    contract (doc_id, source, lang, text): doc_id is the xxhash64 of
    (record_id, target_uri) — stable across re-fetches of the same
    record, so a replayed crawl file produces the same ids and the
    admission anti-join settles it; source is the originating WET file
    (shard provenance, the unit a crawl re-pull revokes); lang comes
    from the engine's own n-gram lang-id heuristic (crawl records
    carry no trusted language tag). Pure JVM expressions — the only
    Python in the whole WET->corpus path stays the record parse."""
    from ..functions import text as T

    return df.select(
        F.xxhash64("record_id", "target_uri").alias("doc_id"),
        F.col("source_file").alias("source"),
        T.lang_id(F.col("text")).alias("lang"),
        "text",
    )


def render_wet(records: list[dict], compress: bool = False) -> bytes:
    """Serialize records back to WET bytes (test round-trips and
    fixture synthesis). ``compress=True`` emits one gzip member per
    record — the Common Crawl concatenated framing."""
    members: list[bytes] = []
    for rec in records:
        body = rec["text"].encode("utf-8")
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec.get('warc_type', 'conversion')}\r\n"
            f"WARC-Record-ID: {rec.get('record_id', '')}\r\n"
            f"WARC-Target-URI: {rec.get('target_uri', '')}\r\n"
            f"WARC-Date: {rec.get('warc_date', '')}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("utf-8")  # URIs are IRIs; the parser decodes UTF-8
        member = head + body + b"\r\n\r\n"
        members.append(gzip.compress(member) if compress else member)
    return b"".join(members)
