"""Real payload parsing for the PV generation API + portal CSV download.

Closes the gap between the engine's transport-agnostic fetch plumbing
(rest.py) and the reference's two live endpoints: everything except the
actual HTTP socket is implemented and fixture-tested here.

1. XML generation API (reference: fetch_data/pv/nambu_backfill.py:57-128)
   — a day's generation record arrives as XML in ONE OF TWO SHAPES the
   upstream service emits interchangeably:

     a) ``<items><item><ymd>..</ymd><qhorgen01>..</qhorgen01>..</item>
        <item>..</item></items>``         (list of item elements)
     b) ``<items><ymd>..</ymd><qhorgen01>..</qhorgen01>..</items>``
                                          (a single flattened item)

   plus a ``resultCode``/``resultMsg`` header. ``parse_pv_payload``
   normalizes both into a list of tag→text dicts; ``pv_records_df``
   runs it Arrow-batched over a DataFrame of fetched bodies and emits
   the typed record table (identity/daily columns + an ``hours`` map of
   the hourly ``qhorgen*`` columns) that the engine's unpivot (R1/R2)
   and hour-rollover expressions (P8-P10) consume directly.

2. Portal CSV download (reference: fetch_data/pv/namdong_collect_pv.py:
   181-262) — a two-step stateful handshake: GET the menu page so the
   server sets session cookies, then POST the form (org/hoki/date range
   + Referer header) to the csv endpoint; the response is accepted only
   if it both claims CSV and sniffs as CSV (csv_flexible.is_probably_csv
   — the portal returns HTML error pages with 200s). Ranges are split
   per month because the portal truncates longer spans.
   ``download_csv_months`` drives any transport with that protocol; the
   transport (one callable) is the ONLY thing left environment-specific.
"""

from __future__ import annotations

import datetime as dt
import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..shipping import ensure_worker_imports
from .csv_flexible import is_probably_csv

# Identity + daily-stat tags of one generation record; every other tag
# that starts with HOUR_PREFIX is an hourly value column (the upstream
# column set varies — qhorgen01..24 with occasional gaps).
ID_TAGS = ("ymd", "gencd", "hogi", "ipptnm")
DAILY_TAGS = ("qvodgen", "qvodavg", "qvodmax", "qvodmin")
HOUR_PREFIX = "qhorgen"

PV_RECORD_SCHEMA = (
    "ymd string, gencd string, hogi string, ipptnm string, "
    "qvodgen string, qvodavg string, qvodmax string, qvodmin string, "
    "hours map<string,string>"
)


def parse_pv_payload(xml_text: str) -> list[dict[str, str]]:
    """Both live response shapes → list of tag→text dicts.

    Returns [] for error payloads (non-00 resultCode with no items),
    empty ``<items/>``, or bodies that are not XML at all — the fetch
    layer treats an empty record list as "retry next run", never as a
    stage failure (rest.run_fetch semantics)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    # iter() includes the ROOT element, unlike find(".//..."), which
    # searches descendants only — a bare '<items><ymd>...</items>'
    # document (root element IS items) must not be silently dropped
    items = list(root.iter("item"))
    if items:
        return [
            {child.tag: (child.text or "").strip() for child in item}
            for item in items
        ]
    items_node = next(root.iter("items"), None)
    if items_node is not None and len(items_node):
        return [
            {child.tag: (child.text or "").strip() for child in items_node}
        ]
    return []


def _record_row(rec: dict[str, str]) -> dict:
    return {
        **{t: rec.get(t) for t in ID_TAGS},
        **{t: rec.get(t) for t in DAILY_TAGS},
        "hours": {
            k: v for k, v in rec.items() if k.startswith(HOUR_PREFIX)
        },
    }


def pv_records_df(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """(fetch-unit rows with an XML ``body_col``) → typed record table.

    Arrow-batched mapInPandas: parsing stays on the executors next to
    the fetch that produced the body — at backfill scale (years × plants
    × units) the XML never moves to the driver."""
    ensure_worker_imports(bodies.sparkSession)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from energy_data_pipeline_spark.sources.pv_api import (
            _record_row,
            parse_pv_payload,
        )

        for pdf in batches:
            rows = []
            for body in pdf[body_col]:
                for rec in parse_pv_payload(body or ""):
                    rows.append(_record_row(rec))
            yield pd.DataFrame(
                rows,
                columns=[*ID_TAGS, *DAILY_TAGS, "hours"],
            )

    return bodies.mapInPandas(parse, schema=PV_RECORD_SCHEMA)


def urllib_xml_fetcher(
    url_for: Callable[[dict], str], timeout_s: float = 30.0
) -> Callable[[dict], list[dict]]:
    """A REAL executor-side fetcher for ``rest.run_fetch``: GET the
    task's URL over stdlib urllib, parse the XML payload into record
    rows. The HTTP session is created LAZILY inside the closure on its
    first call, so the fetcher cloudpickles to executors cleanly (an
    OpenerDirector holds unpicklable state) and each worker keeps one
    session — the distributed twin of the reference's driver-side
    aiohttp loop (nambu_backfill.py:57-128). Non-200 / non-XML bodies
    yield [] (run_fetch's retry-then-skip semantics)."""
    session: list[Transport] = []

    def fetch(task: dict) -> list[dict]:
        if not session:
            session.append(urllib_transport(timeout_s))
        status, _ctype, body = session[0]("GET", url_for(task))
        if status != 200:
            return []
        return [
            _record_row(rec)
            for rec in parse_pv_payload(body.decode("utf-8", "replace"))
        ]

    return fetch


# ---------------------------------------------------------------- CSV portal

# transport(method, url, *, data=None, headers=None)
#   -> (status: int, content_type: str, body: bytes)
# One callable carries the session state (cookies) across the two steps —
# exactly what aiohttp.ClientSession / requests.Session provide.
Transport = Callable[..., tuple[int, str, bytes]]


def urllib_transport(timeout_s: float = 30.0) -> Transport:
    """A REAL ``Transport`` over the stdlib — ``urllib.request`` with an
    ``http.cookiejar`` session, so the two-step cookie handshake works
    against a live server with zero third-party dependencies. Each call
    to this factory is one SESSION (one cookie jar), matching the
    aiohttp.ClientSession lifetime in the reference
    (namdong_collect_pv.py:181-262). Form dicts are urlencoded for
    POST; non-2xx responses return their status rather than raising, so
    the caller's skip-and-continue semantics hold. Tests drive it
    hermetically against a loopback ``http.server``; deployments point
    it at the real portal — the transport seam is no longer a stub."""
    import urllib.error
    import urllib.parse
    import urllib.request
    from http.cookiejar import CookieJar

    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(CookieJar())
    )

    def transport(
        method: str,
        url: str,
        *,
        data: dict[str, str] | bytes | None = None,
        headers: dict[str, str] | None = None,
    ) -> tuple[int, str, bytes]:
        body: bytes | None = None
        if data is not None:
            body = (
                urllib.parse.urlencode(data).encode("ascii")
                if isinstance(data, dict)
                else data
            )
        req = urllib.request.Request(
            url, data=body, headers=headers or {}, method=method.upper()
        )
        try:
            with opener.open(req, timeout=timeout_s) as resp:
                return (
                    resp.status,
                    resp.headers.get("Content-Type", ""),
                    resp.read(),
                )
        except urllib.error.HTTPError as e:  # non-2xx still has a body
            return e.code, e.headers.get("Content-Type", ""), e.read()

    return transport


def split_by_month(date_s: str, date_e: str) -> list[tuple[str, str]]:
    """Inclusive YYYYMMDD range → per-calendar-month (start, end) spans,
    clipped to the requested range."""
    start = dt.date(int(date_s[:4]), int(date_s[4:6]), int(date_s[6:8]))
    end = dt.date(int(date_e[:4]), int(date_e[4:6]), int(date_e[6:8]))
    if start > end:
        return []
    spans = []
    cur = start
    while cur <= end:
        if cur.month == 12:
            month_end = dt.date(cur.year, 12, 31)
        else:
            month_end = dt.date(cur.year, cur.month + 1, 1) - dt.timedelta(days=1)
        span_end = min(month_end, end)
        spans.append((cur.strftime("%Y%m%d"), span_end.strftime("%Y%m%d")))
        cur = span_end + dt.timedelta(days=1)
    return spans


def download_csv_months(
    transport: Transport,
    main_url_for: Callable[[str, str], str],
    csv_url: str,
    form_base: dict[str, str],
    date_s: str,
    date_e: str,
) -> list[tuple[str, str, bytes]]:
    """Drive the two-step cookie handshake once per month span.

    Per span: GET ``main_url_for(ds, de)`` (the transport's session
    collects the cookies), then POST ``csv_url`` with the form fields +
    that URL as Referer. A span is kept only if the POST returns 200
    AND the body both claims and sniffs as CSV; anything else is
    skipped (the reference's behavior: log and continue — a failed
    month is re-planned by the caller's completeness check, T7-style).

    Returns [(date_s, date_e, csv_bytes), ...] for the accepted spans.
    """
    out: list[tuple[str, str, bytes]] = []
    for ds, de in split_by_month(date_s, date_e):
        main_url = main_url_for(ds, de)
        try:
            status, _ctype, _body = transport("GET", main_url)
        except Exception:
            continue
        if status != 200:
            continue
        form = {**form_base, "strDateS": ds, "strDateE": de}
        try:
            status, ctype, body = transport(
                "POST",
                csv_url,
                data=form,
                headers={
                    "Referer": main_url,
                    "Content-Type": "application/x-www-form-urlencoded",
                },
            )
        except Exception:
            continue
        if status != 200 or "csv" not in (ctype or "").lower():
            continue
        if not is_probably_csv(body):
            continue
        out.append((ds, de, body))
    return out
