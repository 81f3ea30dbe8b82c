"""Payload-parsing tests for the PV XML API and portal CSV handshake
(sources/pv_api.py) — the two live endpoint shapes from the reference
(nambu_backfill.py:57-128, namdong_collect_pv.py:181-262), fixture-fed
so the whole path short of the HTTP socket is exercised hermetically."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_data_pipeline_spark.sources.pv_api import (
    download_csv_months,
    parse_pv_payload,
    pv_records_df,
    split_by_month,
)

_ITEM_FIELDS = (
    "<ymd>20240105</ymd><gencd>G1</gencd><hogi>1</hogi>"
    "<ipptnm>Plant A</ipptnm><qvodgen>120.5</qvodgen>"
    "<qvodavg>5.0</qvodavg><qvodmax>11.0</qvodmax><qvodmin>0.0</qvodmin>"
    "<qhorgen01>1.5</qhorgen01><qhorgen02>2.5</qhorgen02>"
    "<qhorgen24>0.5</qhorgen24>"
)

SHAPE_A = (  # <items><item>...</item><item>...</item></items>
    "<response><header><resultCode>00</resultCode>"
    "<resultMsg>OK</resultMsg></header><body><items>"
    f"<item>{_ITEM_FIELDS}</item>"
    "<item><ymd>20240106</ymd><gencd>G1</gencd><hogi>1</hogi>"
    "<ipptnm>Plant A</ipptnm><qvodgen>99</qvodgen><qvodavg>4</qvodavg>"
    "<qvodmax>9</qvodmax><qvodmin>0</qvodmin>"
    "<qhorgen01>9.0</qhorgen01></item>"
    "</items></body></response>"
)

SHAPE_B = (  # flattened single item directly under <items>
    "<response><header><resultCode>00</resultCode></header>"
    f"<body><items>{_ITEM_FIELDS}</items></body></response>"
)

ERROR_BODY = (
    "<response><header><resultCode>30</resultCode>"
    "<resultMsg>SERVICE KEY IS NOT REGISTERED</resultMsg></header>"
    "<body><items/></body></response>"
)


class TestParsePvPayload:
    def test_shape_a_item_list(self):
        recs = parse_pv_payload(SHAPE_A)
        assert len(recs) == 2
        assert recs[0]["ymd"] == "20240105"
        assert recs[0]["qhorgen02"] == "2.5"
        assert recs[1]["qhorgen01"] == "9.0"

    def test_shape_b_flattened_single(self):
        recs = parse_pv_payload(SHAPE_B)
        assert len(recs) == 1
        assert recs[0]["ymd"] == "20240105"
        assert recs[0]["qvodgen"] == "120.5"
        assert recs[0]["qhorgen24"] == "0.5"

    def test_error_and_garbage_yield_no_records(self):
        assert parse_pv_payload(ERROR_BODY) == []
        assert parse_pv_payload("this is not xml <<<") == []
        assert parse_pv_payload("<response><body/></response>") == []

    def test_bare_items_root_document(self):
        # root element IS <items> (no <response> wrapper) — iter()
        # includes the root, find('.//') would silently drop it
        recs = parse_pv_payload(f"<items>{_ITEM_FIELDS}</items>")
        assert len(recs) == 1
        assert recs[0]["ymd"] == "20240105"
        # and a bare <item> root likewise
        recs = parse_pv_payload(f"<item>{_ITEM_FIELDS}</item>")
        assert len(recs) == 1
        assert recs[0]["qvodgen"] == "120.5"


def test_pv_records_to_hourly_long(spark):
    """Fetched bodies → typed records → exploded hourly rows with the
    engine's hour-24 rollover: the full post-fetch ingest path."""
    from energy_data_pipeline_spark.functions.expressions import (
        hour_from_column_name,
        ts_hour24_rollover,
    )

    bodies = spark.createDataFrame(
        [("t1", SHAPE_A), ("t2", SHAPE_B), ("t3", ERROR_BODY)],
        "task_id string, body string",
    )
    recs = pv_records_df(bodies)
    assert recs.count() == 3  # 2 from shape A + 1 from shape B

    hourly = (
        recs.select(
            "ymd",
            "gencd",
            F.explode("hours").alias("hcol", "val"),
        )
        .withColumn(
            "hour1", hour_from_column_name(F.col("hcol"), keep_one_based=True)
        )
        .withColumn(
            "ts",
            ts_hour24_rollover(F.to_date("ymd", "yyyyMMdd"), F.col("hour1")),
        )
        .withColumn("generation", F.col("val").cast("double"))
    )
    got = {
        (r["ymd"], r["hour1"]): (str(r["ts"]), r["generation"])
        for r in hourly.collect()
    }
    assert got[("20240105", 1)] == ("2024-01-05 01:00:00", 1.5)
    # hour 24 rolls to next-day midnight
    assert got[("20240105", 24)] == ("2024-01-06 00:00:00", 0.5)
    assert got[("20240106", 1)] == ("2024-01-06 01:00:00", 9.0)


def test_split_by_month_clips_and_covers():
    spans = split_by_month("20240115", "20240310")
    assert spans == [
        ("20240115", "20240131"),
        ("20240201", "20240229"),  # leap year
        ("20240301", "20240310"),
    ]
    assert split_by_month("20240105", "20240105") == [("20240105", "20240105")]
    assert split_by_month("20240201", "20240101") == []


class _FakeTransport:
    """Records the protocol: cookies must be established by the GET
    before the POST is honored; non-CSV months return an HTML error."""

    def __init__(self, bad_months=()):
        self.calls = []
        self.has_cookie = False
        self.bad_months = set(bad_months)

    def __call__(self, method, url, data=None, headers=None):
        self.calls.append((method, url, data, headers))
        if method == "GET":
            self.has_cookie = True
            return 200, "text/html", b"<html>menu</html>"
        if not self.has_cookie:
            return 403, "text/html", b"<html>no session</html>"
        assert headers and headers.get("Referer", "").startswith("http://portal/")
        ds = data["strDateS"]
        if ds[:6] in self.bad_months:
            return 200, "text/html", b"<html>error page</html>"
        return (
            200,
            "application/csv; charset=euc-kr",
            b"ymd,hogi,generation\n" + f"{ds},1,42.0\n".encode(),
        )


def test_download_csv_months_handshake_and_sniff():
    t = _FakeTransport(bad_months={"202402"})
    got = download_csv_months(
        t,
        main_url_for=lambda ds, de: f"http://portal/main.do?s={ds}&e={de}",
        csv_url="http://portal/csvDown.do",
        form_base={"pageIndex": "1", "menuCd": "M1", "strOrgNo": "822"},
        date_s="20240115",
        date_e="20240310",
    )
    # 3 month spans attempted, the HTML-error month dropped by the sniff
    assert [(ds, de) for ds, de, _ in got] == [
        ("20240115", "20240131"),
        ("20240301", "20240310"),
    ]
    assert all(body.startswith(b"ymd,hogi") for _, _, body in got)
    # protocol: GET(main) precedes each POST(csv) and carries the form
    methods = [c[0] for c in t.calls]
    assert methods == ["GET", "POST"] * 3
    post = t.calls[1]
    assert post[2]["strDateS"] == "20240115" and post[2]["menuCd"] == "M1"
