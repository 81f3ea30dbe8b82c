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


def test_urllib_transport_live_cookie_handshake():
    """The REAL stdlib transport against a live loopback http.server:
    the GET must collect the session cookie, the POST must present it
    back with the urlencoded form + Referer, and download_csv_months
    must accept the CSV — the whole portal protocol over actual
    sockets, hermetically."""
    import http.server
    import threading
    import urllib.parse

    from energy_data_pipeline_spark.sources.pv_api import urllib_transport

    seen = {"posts": []}

    class Portal(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Set-Cookie", "JSESSIONID=live123; Path=/")
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html>portal</html>")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            form = dict(
                urllib.parse.parse_qsl(self.rfile.read(length).decode())
            )
            seen["posts"].append(
                {
                    "cookie": self.headers.get("Cookie"),
                    "referer": self.headers.get("Referer"),
                    "form": form,
                }
            )
            if self.headers.get("Cookie") != "JSESSIONID=live123":
                # no session: the portal would serve an HTML error page
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(b"<html>login required</html>")
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/csv; charset=euc-kr")
            self.end_headers()
            self.wfile.write(
                f"ymd,hogi,gen\n{form['strDateS']},1,42.5\n".encode()
            )

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Portal)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        got = download_csv_months(
            urllib_transport(timeout_s=5.0),
            main_url_for=lambda ds, de: f"{base}/main.do?s={ds}&e={de}",
            csv_url=f"{base}/csvDown.do",
            form_base={"menuCd": "M1"},
            date_s="20240110",
            date_e="20240215",
        )
    finally:
        srv.shutdown()

    assert [(ds, de) for ds, de, _ in got] == [
        ("20240110", "20240131"),
        ("20240201", "20240215"),
    ]
    assert got[0][2].startswith(b"ymd,hogi\n") or got[0][2].startswith(
        b"ymd,hogi,gen\n"
    )
    # the session cookie collected on GET rode the POSTs
    assert all(p["cookie"] == "JSESSIONID=live123" for p in seen["posts"])
    assert all("main.do" in p["referer"] for p in seen["posts"])
    assert seen["posts"][0]["form"]["strDateS"] == "20240110"


def test_urllib_xml_fetcher_distributed_fanout_live(spark):
    """End-to-end over REAL sockets: a task table fans out via
    rest.run_fetch/mapInPandas, each EXECUTOR worker GETs its task's
    URL from a loopback XML server through the lazy per-worker urllib
    session, parses the payload, and the typed rows land back in a
    DataFrame — the reference's asyncio collector as a distributed
    Spark stage, hermetically."""
    import http.server
    import threading
    import urllib.parse

    from energy_data_pipeline_spark.sources.pv_api import (
        PV_RECORD_SCHEMA,
        urllib_xml_fetcher,
    )
    from energy_data_pipeline_spark.sources.rest import (
        fetch_task_table,
        run_fetch,
    )

    class Api(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            q = dict(
                urllib.parse.parse_qsl(urllib.parse.urlparse(self.path).query)
            )
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.end_headers()
            self.wfile.write(
                (
                    "<resp><items><item>"
                    f"<ymd>{q['ymd']}</ymd><gencd>{q['gencd']}</gencd>"
                    f"<hogi>{q['hogi']}</hogi><ipptnm>plant</ipptnm>"
                    "<qvodgen>10.5</qvodgen><qhorgen01>1.0</qhorgen01>"
                    "</item></items></resp>"
                ).encode()
            )

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Api)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        tasks = fetch_task_table(
            spark, ["20240101", "20240102"], [("G1", 1), ("G2", 2)]
        )
        fetcher = urllib_xml_fetcher(
            lambda t: f"{base}/pv?ymd={t['ymd']}&gencd={t['gencd']}"
            f"&hogi={t['hogi']}"
        )
        got = run_fetch(tasks, fetcher, PV_RECORD_SCHEMA).collect()
    finally:
        srv.shutdown()

    assert len(got) == 4
    by_key = {(r["ymd"], r["gencd"], r["hogi"]) for r in got}
    assert by_key == {
        ("20240101", "G1", "1"),
        ("20240101", "G2", "2"),
        ("20240102", "G1", "1"),
        ("20240102", "G2", "2"),
    }
    assert all(r["qvodgen"] == "10.5" for r in got)
    assert all(r["hours"]["qhorgen01"] == "1.0" for r in got)
