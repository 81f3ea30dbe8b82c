"""Property-based tests (hypothesis) for semantics that must hold on ANY
input: dedup keep-first/last vs a pandas reference, unpivot row algebra,
rounding parity with DuckDB, salted ops == unsalted ops."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from energy_data_pipeline_spark.functions.rounding import rnd
from energy_data_pipeline_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_last,
)
from energy_data_pipeline_spark.operators.reshape import unpivot_hours
from energy_data_pipeline_spark.operators.skew import salted_agg_sum, salted_join

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=100),  # seq
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_matches_pandas(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"])
    df = spark.createDataFrame(pdf)

    got_first = (
        dedup_keep_first(df, keys=["k"], order_col="seq")
        .orderBy("k", "seq")
        .toPandas()
    )
    want_first = (
        pdf.sort_values(["seq", "v"], kind="stable")
        .drop_duplicates(subset=["k"], keep="first")
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    # compare (k, seq): value ties on equal seq are resolved by the op's
    # deterministic tie-break, pandas keeps input order — compare the
    # chosen seq only
    assert list(got_first["k"]) == list(want_first["k"])
    assert list(got_first["seq"]) == list(want_first["seq"])

    got_last = (
        dedup_keep_last(df, keys=["k"], order_col="seq").orderBy("k", "seq").toPandas()
    )
    want_last = (
        pdf.sort_values(["seq", "v"], kind="stable")
        .drop_duplicates(subset=["k"], keep="last")
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    assert list(got_last["k"]) == list(want_last["k"])
    assert list(got_last["seq"]) == list(want_last["seq"])


@given(
    n_ids=st.integers(min_value=1, max_value=5),
    n_hours=st.integers(min_value=1, max_value=24),
)
@SETTINGS
def test_unpivot_row_algebra(spark, n_ids, n_hours):
    cols = {"gencd": [f"G{i}" for i in range(n_ids)]}
    for h in range(1, n_hours + 1):
        cols[f"qhorgen{h:02d}"] = [float(h * 10 + i) for i in range(n_ids)]
    df = spark.createDataFrame(pd.DataFrame(cols))
    long = unpivot_hours(df, ["gencd"])
    assert long.count() == n_ids * n_hours
    back = long.groupBy("gencd").pivot("hour_label").agg(F.first("generation"))
    assert back.count() == n_ids


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=25,
    ),
    digits=st.integers(min_value=0, max_value=6),
)
@SETTINGS
def test_rnd_matches_duckdb(spark, vals, digits):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r[0] for r in df.select(rnd(F.col("v"), digits).alias("r")).collect()]
    con = duckdb.connect()
    want = [
        con.sql(f"select round({v!r}::DOUBLE, {digits})").fetchone()[0] for v in vals
    ]
    assert got == pytest.approx(want, abs=10 ** -(digits + 6))


@given(rows=rows_strategy)
@SETTINGS
def test_salted_ops_equal_unsalted(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"])
    df = spark.createDataFrame(pdf)
    dim = spark.createDataFrame(
        pd.DataFrame({"k": range(6), "name": [f"n{i}" for i in range(6)]})
    )

    plain = df.join(dim, ["k"]).groupBy("k").agg(F.sum("v").alias("t"))
    salted = salted_join(df, dim, ["k"]).groupBy("k").agg(F.sum("v").alias("t"))
    a = {(r["k"], round(r["t"], 6)) for r in plain.collect()}
    b = {(r["k"], round(r["t"], 6)) for r in salted.collect()}
    assert a == b

    plain_agg = {
        (r["k"], round(r["total"], 6))
        for r in df.groupBy("k").agg(F.sum("v").alias("total")).collect()
    }
    salted_agg = {
        (r["k"], round(r["total"], 6))
        for r in salted_agg_sum(df, ["k"], "v").collect()
    }
    assert plain_agg == salted_agg


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=11),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=24,
)


@given(edges=edges_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    """The distributed hook+shortcut labeling must equal a sequential
    union-find's min-vertex-per-component on ANY pair graph."""
    from energy_data_pipeline_spark.operators.components import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a), parent.setdefault(b, b)
        parent[find(a)] = find(b)
    comp_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in parent}

    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {
        r["vertex"]: r["cluster_id"]
        for r in connected_components(pairs, "id1", "id2", small_graph_max_edges=0).collect()
    }
    assert got == want


@given(
    start=st.dates(min_value=pd.Timestamp("2000-01-01").date(),
                   max_value=pd.Timestamp("2030-12-31").date()),
    span_days=st.integers(min_value=0, max_value=500),
)
@SETTINGS
def test_split_by_month_partitions_range(start, span_days):
    """Month spans must tile the requested range exactly: contiguous, no
    overlap, every span inside one calendar month, ends clipped."""
    import datetime as dt

    from energy_data_pipeline_spark.sources.pv_api import split_by_month

    end = start + dt.timedelta(days=span_days)
    fmt = "%Y%m%d"
    spans = split_by_month(start.strftime(fmt), end.strftime(fmt))
    assert spans, "non-empty range must produce spans"
    parsed = [
        (dt.datetime.strptime(s, fmt).date(), dt.datetime.strptime(e, fmt).date())
        for s, e in spans
    ]
    assert parsed[0][0] == start and parsed[-1][1] == end
    for (s, e) in parsed:
        assert s <= e
        assert (s.year, s.month) == (e.year, e.month)  # within one month
    for (_, e_prev), (s_next, _) in zip(parsed, parsed[1:]):
        assert s_next == e_prev + dt.timedelta(days=1)  # contiguous, no gaps


def test_minhash_perm_constants_well_formed():
    """Every affine permutation (a, b) must satisfy 1 <= a < P and
    0 <= b < P (a=0 would collapse a hash function to a constant), and
    the (a, b) pairs must be distinct — 96 copies of one permutation
    would silently degrade the LSH S-curve to 1 effective hash."""
    from energy_data_pipeline_spark.operators.neardup import (
        MINHASH_PERMS,
        MINHASH_PRIME,
        NUM_HASHES,
    )

    assert len(MINHASH_PERMS) == NUM_HASHES
    for a, b in MINHASH_PERMS:
        assert 1 <= a < MINHASH_PRIME
        assert 0 <= b < MINHASH_PRIME
    assert len(set(MINHASH_PERMS)) == NUM_HASHES


@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 100)),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_manifest_upsert_equals_dict_semantics(spark, batches, tmp_path_factory):
    """Any sequence of keyed upsert batches through the manifest table
    must equal last-writer-wins dict application (with the writer's
    in-batch winner rule: max non-key value), and version count must
    equal commit count."""
    from energy_data_pipeline_spark.sinks import manifest_table as mt

    table = str(tmp_path_factory.mktemp("mtab") / "t")
    expect: dict[int, int] = {}
    for batch in batches:
        df = spark.createDataFrame(batch, "k long, v long")
        mt.manifest_upsert(spark, df, table, keys=["k"])
        winners: dict[int, int] = {}
        for k, v in batch:
            winners[k] = max(winners.get(k, v), v)  # in-batch max wins
        expect.update(winners)
    got = {r["k"]: r["v"] for r in mt.manifest_read(spark, table).collect()}
    assert got == expect
    assert mt.read_manifest(table)["version"] == len(batches) - 1


# --- PII redaction: idempotent, and counts match redaction deltas ---------
pii_text_strategy = st.lists(
    st.sampled_from(
        [
            "hello world",
            "a.b@c.io",
            "x@example.com",
            "10.0.0.1",
            "256.1.2.3",
            "+1-555-0100-42",
            "+12345678901",
            "not@ norpii",
            "1.2.3",
            "u_v%w+z@h-1.org",
        ]
    ),
    min_size=0,
    max_size=8,
).map(" ".join)


@given(text=pii_text_strategy)
@SETTINGS
def test_pii_redaction_idempotent(spark, text):
    """redact(redact(x)) == redact(x): placeholder tags contain no
    digits or '@', so a second pass can never match them — the scrub is
    safe to re-run (retried jobs, overlapping backfills)."""
    from energy_data_pipeline_spark.functions.text import redact_pii

    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        redact_pii("text").alias("once"),
        redact_pii(redact_pii("text")).alias("twice"),
    ).collect()[0]
    assert row["once"] == row["twice"]


# --- sequence packing: offsets bounded, tape positions consistent ---------
pack_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=250),  # doc_id
        st.sampled_from(["a", "b"]),  # shard col
        st.integers(min_value=0, max_value=5000),  # n_tokens
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(rows=pack_rows_strategy)
@SETTINGS
def test_sequence_pack_plan_invariants(spark, rows):
    """For every shard: offsets are in [0, seq_len); the tape position
    seq_id*seq_len + seq_offset equals the running token sum in doc_id
    order; seq_id is non-decreasing."""
    from energy_data_pipeline_spark.operators.packing import (
        sequence_pack_plan,
    )

    seq_len = 64
    df = spark.createDataFrame(rows, "doc_id long, shard string, n long")
    out = sequence_pack_plan(
        df, "doc_id", F.col("n"), ["shard"], seq_len=seq_len, shard_docs=100
    ).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault((r["shard"], r["pack_shard"]), []).append(r)
    n_by_id = {t[0]: t[2] for t in rows}
    for key, members in by_shard.items():
        members.sort(key=lambda r: r["doc_id"])
        cum = 0
        prev_seq = -1
        for r in members:
            assert 0 <= r["seq_offset"] < seq_len
            assert r["seq_id"] * seq_len + r["seq_offset"] == cum
            assert r["seq_id"] >= prev_seq
            prev_seq = r["seq_id"]
            cum += n_by_id[r["doc_id"]]


vec_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=4,
        max_size=8,
    ),
    min_size=1,
    max_size=6,
)


@given(vecs=vec_strategy)
@SETTINGS
def test_quantize_int8_bounds_and_error(spark, vecs):
    """For any finite vector: quantized elements stay in [-127, 127],
    the zero vector maps to NULL, and dequantized elements (q/127) are
    within half a quantization step of the true unit-norm coordinate."""
    import math

    from energy_data_pipeline_spark.functions.vectors import (
        norm,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = (
        df.select("vec_id", "embedding", norm("embedding").alias("_n"))
        .select(
            "vec_id",
            "embedding",
            F.when(
                F.col("_n") > 0, quantize_int8("embedding", F.col("_n"))
            ).alias("q8"),
        )
        .collect()
    )
    for r in out:
        # float32 storage: recompute the norm from the ROUND-TRIPPED
        # values the engine actually saw
        stored = [float(np_f32(x)) for x in r["embedding"]]
        n = math.sqrt(sum(x * x for x in stored))
        if n == 0:
            assert r["q8"] is None
            continue
        assert r["q8"] is not None and len(r["q8"]) == len(stored)
        for x, q in zip(stored, r["q8"]):
            assert -127 <= q <= 127
            assert abs(q / 127.0 - x / n) <= 0.5 / 127.0 + 1e-9


def np_f32(x: float) -> float:
    import numpy as np

    return float(np.float32(x))


def test_semdedup_kept_set_has_no_within_cell_dups(spark, sf_small):
    """SemDeDup postcondition on real output: among KEPT vectors, no
    two sharing a cell have cosine >= eps (every such pair must have
    lost its higher-id member), and every dropped vector has a kept
    lower-id witness in its cell at >= eps. Checked exhaustively by a
    driver-side recomputation over the sf0.001 embeddings."""
    import math

    from energy_data_pipeline_spark.plans.catalog_ext import (
        SEMDEDUP_EPS,
        semantic_dedup,
    )
    from energy_data_pipeline_spark.sources import load_table

    kept_rows = semantic_dedup(spark, sf_small).collect()
    kept = {r["vec_id"]: r["cell"] for r in kept_rows}
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_small, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    by_cell: dict = {}
    for vid, cell in kept.items():
        by_cell.setdefault(cell, []).append(vid)
    for cell, ids in by_cell.items():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                assert cos(emb[a], emb[b]) < SEMDEDUP_EPS, (
                    f"kept near-dup pair ({a}, {b}) in cell {cell}"
                )
    # dropped vectors: must have a lower-id kept witness in-cell...
    # a dropped vector's witness may itself be any LOWER-id vector
    # (kept or since-dropped) — the rule is pairwise, not transitive,
    # so assert the weaker (and exact) condition: some lower-id vector
    # in the same cell is >= eps
    from energy_data_pipeline_spark.operators import ivf
    from energy_data_pipeline_spark.plans.catalog_ext import IVF_TRAIN_ITERS
    from energy_data_pipeline_spark.sources import fan_out

    emb_df = fan_out(load_table(spark, sf_small, "embeddings"))
    cents = ivf.kmeans_lloyd(
        emb_df, "vec_id", "embedding", k=ivf.N_CELLS, iterations=IVF_TRAIN_ITERS
    )
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf.ivf_assign(emb_df, cents).select("vec_id", "cell").collect()
    }
    dropped = set(emb) - set(kept)
    assert dropped, "threshold should drop something at sf0.001"
    for vid in dropped:
        witnesses = [
            o
            for o, c in cells.items()
            if c == cells[vid] and o < vid and cos(emb[o], emb[vid]) >= SEMDEDUP_EPS
        ]
        assert witnesses, f"vector {vid} was dropped with no in-cell witness"


def test_dsir_weights_favor_target_source(spark, sf_small):
    """DSIR sanity: documents FROM the target exemplar slice must score
    a higher mean importance weight than the rest of the corpus — the
    defining property of importance resampling toward a target domain
    (each target doc's features are, in aggregate, more likely under
    the target distribution they helped define)."""
    from pyspark.sql import functions as F

    from energy_data_pipeline_spark.plans.catalog_corpus import (
        DSIR_TARGET_SOURCE,
        dsir_importance_weights,
    )
    from energy_data_pipeline_spark.sources import load_table

    w = dsir_importance_weights(spark, sf_small)
    docs = load_table(spark, sf_small, "documents").select("doc_id", "source")
    means = {
        r["is_target"]: r["m"]
        for r in w.join(docs, "doc_id")
        .groupBy((F.col("source") == DSIR_TARGET_SOURCE).alias("is_target"))
        .agg(F.avg("avg_log_ratio").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


# --- progressive JPEG == baseline JPEG on ANY image ----------------------
@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(min_value=4, max_value=25),
    w=st.integers(min_value=4, max_value=25),
    color=st.booleans(),
    subsample=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_progressive_jpeg_decodes_identically_to_baseline(
    h, w, color, subsample, seed
):
    """For ANY image content/geometry, the progressive scan script
    refined to Al=0 carries exactly the baseline coefficients — decode
    of both encodings must be bit-identical (successive-approximation
    refinement, EOB-run, ZRL and non-interleaved block-walk paths all
    sit under this one invariant)."""
    import numpy as np

    from energy_data_pipeline_spark.operators import multimodal

    from .test_operators_unit import _jpeg_bytes, _jpeg_progressive_bytes

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    px = rng.integers(0, 256, size=shape, dtype="u1")
    sub = subsample and color
    base = multimodal._parse_jpeg(_jpeg_bytes(px, subsample=sub))
    prog = multimodal._parse_jpeg(_jpeg_progressive_bytes(px, subsample=sub))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)


# --- round-10 session-2: OLS trend + Benford digit extraction ------------
_trend_series = st.dictionaries(
    st.sampled_from(["click", "view", "purchase"]),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # day offset
            st.floats(min_value=0.01, max_value=500, allow_nan=False),
        ),
        min_size=1,
        max_size=20,
    ),
    min_size=1,
    max_size=3,
)


@given(series=_trend_series)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_linear_trend_matches_numpy_lstsq(spark, series, tmp_path_factory):
    """ts_linear_trend's closed-form slope/intercept/r² must match an
    independent numpy least-squares on the same (rounded) daily
    totals, for ANY per-type series shape — including single-day
    (NULL) and zero-variance cases."""
    import datetime as dt

    import numpy as np

    from energy_data_pipeline_spark.plans.catalog_timeseries import (
        linear_trend,
    )

    d = tmp_path_factory.mktemp("trend")
    rows = []
    for etype, pts in series.items():
        for off, v in pts:
            rows.append(
                (
                    etype,
                    dt.datetime(2024, 1, 1) + dt.timedelta(days=off, hours=3),
                    float(v),
                )
            )
    spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = {
        r["event_type"]: r for r in linear_trend(spark, str(d)).collect()
    }
    for etype, pts in series.items():
        daily: dict[int, float] = {}
        for off, v in pts:
            daily[off] = daily.get(off, 0.0) + float(v)
        days = sorted(daily)
        x = np.array([day - days[0] for day in days], dtype=float)
        y = np.array([round(daily[day], 4) for day in days], dtype=float)
        r = got[etype]
        assert r["n_days"] == len(days)
        if len(days) < 2:
            assert r["slope"] is None and r["r2"] is None
            continue
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r["slope"] - slope) <= 1e-5, (etype, r, slope)
        assert abs(r["intercept"] - intercept) <= 1e-5
        yhat = slope * x + intercept
        ss_res = float(((y - yhat) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        if ss_tot == 0.0:
            assert r["r2"] is None  # zero y-variance: guard emits NULL
        else:
            assert abs(r["r2"] - (1.0 - ss_res / ss_tot)) <= 1e-5


_benford_vals = st.lists(
    st.one_of(
        st.floats(min_value=0.0, max_value=1e19, allow_nan=False,
                  allow_infinity=False),
        st.just(float("nan")),
        st.just(float("inf")),
        st.just(9.999999999),
        st.just(1e17),
    ),
    min_size=1,
    max_size=60,
)


@given(vals=_benford_vals)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_benford_digit_extraction_matches_python(spark, vals, tmp_path_factory):
    """The Benford profile's digit counts must equal a pure-Python
    reference (str(math.floor(v))[0]) over the SAME eligibility rule
    (finite, 1 <= v < 1e18) — non-finite and overflow values never
    reach the digit cast in either engine."""
    import collections
    import math

    from energy_data_pipeline_spark.plans.catalog_timeseries import (
        benford_digit_profile,
    )

    import datetime as dt

    d = tmp_path_factory.mktemp("benford")
    spark.createDataFrame(
        [
            (f"e{i}", dt.datetime(2024, 1, 1, i % 24), float(v))
            for i, v in enumerate(vals)
        ],
        "event_id string, ts timestamp_ntz, value double",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    expect: collections.Counter = collections.Counter()
    for v in vals:
        if math.isfinite(v) and 1.0 <= v < 1.0e18:
            expect[int(str(int(math.floor(v)))[0])] += 1
    got = {r["digit"]: r["n"] for r in benford_digit_profile(spark, str(d)).collect()}
    assert got == dict(expect)


# --- round-10 session-2: fuzz the TIFF and VP8L builtin kernels ----------
@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    gray=st.booleans(),
    big_endian=st.booleans(),
    comp=st.sampled_from([1, 5, 8, 32773]),
    predictor=st.sampled_from([1, 2]),
    rps=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_tiff_roundtrip_fuzz(h, w, gray, big_endian, comp, predictor, rps, seed):
    """Any 8-bit image × any (byte order, compression, predictor,
    strip height) combination must roundtrip bit-exactly through the
    builtin TIFF kernel."""
    import numpy as np

    from energy_data_pipeline_spark.operators import multimodal
    from tests.test_operators_unit import _tiff_bytes

    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.randint(0, 256, size=shape).astype("u1")
    arr = multimodal._parse_tiff(
        _tiff_bytes(
            px,
            big_endian=big_endian,
            compression=comp,
            predictor=predictor,
            rows_per_strip=min(rps, h),
        )
    )
    assert np.allclose(arr * 255.0, px, atol=1e-12)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    n_colors=st.integers(min_value=1, max_value=24),
    cache_bits=st.sampled_from([0, 3, 6]),
    use_lz77=st.booleans(),
    subtract_green=st.booleans(),
    pred_bits=st.sampled_from([None, 2, 3]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_vp8l_roundtrip_fuzz(
    h, w, n_colors, cache_bits, use_lz77, subtract_green, pred_bits, seed
):
    """Any low-cardinality RGB image × any (cache, LZ77,
    subtract-green, predictor) combination must roundtrip bit-exactly
    through the builtin VP8L kernel — low color counts maximize run/
    cache-hit coverage, tiny dimensions stress edge predictors."""
    import numpy as np

    from energy_data_pipeline_spark.operators import multimodal
    from tests.test_operators_unit import _webp_bytes

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_colors, 3)).astype("u1")
    px = pal[rng.randint(0, n_colors, size=(h, w))]
    arr = multimodal._parse_vp8l(
        _webp_bytes(
            px,
            cache_bits=cache_bits,
            use_lz77=use_lz77,
            subtract_green=subtract_green,
            predictor_size_bits=pred_bits,
        )
    )
    assert np.allclose(arr * 255.0, px, atol=1e-12)


@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=300),
    stereo=st.booleans(),
    bps=st.sampled_from([8, 16, 24]),
    mode=st.sampled_from(["indep", "left_side", "right_side", "mid_side"]),
    kind=st.sampled_from(
        ["verbatim", "constant", "fixed0", "fixed1", "fixed2", "fixed3",
         "fixed4", "lpc"]
    ),
    porder=st.sampled_from([0, 1, 2]),
    escape=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_flac_roundtrip_fuzz(n, stereo, bps, mode, kind, porder, escape, seed):
    """Any PCM stream × any (bit depth, stereo decorrelation, subframe
    type, partition order, escape) combination must roundtrip
    bit-exactly through the builtin FLAC kernel."""
    import numpy as np

    from energy_data_pipeline_spark.operators import multimodal
    from tests.test_operators_unit import _flac_bytes

    if not stereo:
        mode = "indep"  # decorrelation modes need two channels
    rng = np.random.RandomState(seed)
    lim = 1 << (bps - 3)
    shape = (n, 2) if stereo else (n,)
    s = np.cumsum(rng.randint(-lim // 8, lim // 8, size=shape), axis=0).clip(
        -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    )
    x, nch = multimodal._parse_flac(
        _flac_bytes(s, bps=bps, mode=mode, blocksize=64, kind=kind,
                    porder=porder, escape=escape)
    )
    assert nch == (2 if stereo else 1)
    mono = s.mean(axis=1) if stereo else s.astype("float64")
    assert np.allclose(x, mono / float(1 << (bps - 1)), atol=1e-12)


def test_bit_reader_field_ops_match_bit_loops():
    """The round-11 whole-field bit-reader rewrites (JPEG peek16/skip/
    read_bits, VP8L read/peek15, FLAC unary) must agree with the
    reference per-bit loops at every offset over random data."""
    import numpy as np

    from energy_data_pipeline_spark.operators.multimodal import (
        _FlacBits,
        _JpegBitReader,
        _VP8LBits,
    )

    rng = np.random.RandomState(3)
    data = bytes(rng.randint(0, 256, 48, dtype="u1").tolist())

    def msb_bits(pos, n):
        v = 0
        for i in range(n):
            p = pos + i
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
        return v

    def lsb_bits(pos, n):
        v = 0
        for i in range(n):
            p = pos + i
            v |= ((data[p >> 3] >> (p & 7)) & 1) << i
        return v

    for start in range(0, 120):
        for n in range(0, 17):
            if start + n > len(data) * 8:
                continue
            r = _JpegBitReader(data)
            r.skip(start)
            assert r.read_bits(n) == msb_bits(start, n), (start, n)
            assert (r.pos * 8 + r.bit) == start + n
            b = _VP8LBits(data)
            b.pos = start
            assert b.read(n) == lsb_bits(start, n), (start, n)
        r = _JpegBitReader(data)
        r.skip(start)
        want16 = msb_bits(start, min(16, len(data) * 8 - start))
        want16 <<= 16 - min(16, len(data) * 8 - start)  # zero-pad
        assert r.peek16() == want16, start
        b = _VP8LBits(data)
        b.pos = start
        assert b.peek15() == lsb_bits(start, min(15, len(data) * 8 - start)), start

    # unary vs the reference bit loop, at every start offset
    def ref_unary(pos):
        q = 0
        while True:
            if pos >= len(data) * 8:
                return None, None
            bit = (data[pos >> 3] >> (7 - (pos & 7))) & 1
            pos += 1
            if bit:
                return q, pos
            q += 1

    for start in range(0, 260):
        want_q, want_pos = ref_unary(start)
        f = _FlacBits(data)
        f.pos, f.bit = start >> 3, start & 7
        if want_q is None:
            import pytest as _pytest

            with _pytest.raises(ValueError):
                f.unary()
        else:
            assert f.unary() == want_q, start
            assert f.pos * 8 + f.bit == want_pos, start
