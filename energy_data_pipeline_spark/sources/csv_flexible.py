"""S1 — encoding-fallback CSV reader with header normalization.

Parity: read_csv_flexible (fetch_data/pv/namdong_merge_pv_data.py:25-49)
— try cp949 → euc-kr → utf-8-sig → utf-8, normalize whitespace-mangled
headers, strip leading spaces in fields.

Spark cannot cheaply "try" an encoding distributedly, so the probe reads
only a small head sample per encoding on the driver (decode check), then
issues ONE distributed read with the winning encoding — the 100 TB path
never round-trips data through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ENCODING_CHAIN = ("cp949", "euc-kr", "utf-8-sig", "utf-8")


def _probe_encoding(path: str, encodings=ENCODING_CHAIN, sample_bytes: int = 65536) -> str:
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    for enc in encodings:
        try:
            head.decode(enc)
            return enc
        except (UnicodeDecodeError, LookupError):
            continue
    return "utf-8"


def read_csv_flexible(
    spark: SparkSession,
    path: str,
    encodings=ENCODING_CHAIN,
    **options,
) -> DataFrame:
    """Read a CSV whose encoding is unknown; normalize headers."""
    enc = _probe_encoding(path, encodings)
    # utf-8-sig: Spark handles the BOM when told the charset is UTF-8
    charset = {"utf-8-sig": "UTF-8", "euc-kr": "EUC-KR", "cp949": "x-windows-949"}.get(
        enc, enc.upper()
    )
    if charset not in ("UTF-8", "UTF-16", "ISO-8859-1", "US-ASCII"):
        # Spark 4 gates non-core charsets behind the javaCharsets flag
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    reader = (
        spark.read.option("header", "true")
        .option("encoding", charset)
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    cleaned = [" ".join(c.split()).strip() for c in df.columns]
    return df.toDF(*cleaned)


def is_probably_csv(body: bytes, min_len: int = 20) -> bool:
    """CSV sniffing — rejects HTML/short/comma-less payloads.
    Parity: namdong_collect_pv.py:112-123."""
    if body is None or len(body) < min_len:
        return False
    head = body[:4096].lstrip()
    if head.startswith(b"<") or b"<html" in head.lower():
        return False
    try:
        text = head.decode("utf-8", errors="ignore")
    except Exception:
        return False
    first_line = text.splitlines()[0] if text.splitlines() else ""
    return "," in first_line
