"""WET -> admission -> silver -> stats end-to-end probe (round 12).

Synthesizes a crawl snapshot (32 shards x 250 records of ~80-token
documents, ~10% exact dups, ~5% quality failures), runs
``jobs/corpus_ingest.crawl_to_silver_flow`` on local[32], and records
per-stage wall time + docs/s under "round12_wet_chain" in
scale_probe_results.json. A second tick over the same snapshot is
timed too — the idempotent no-op path a re-scheduled tick takes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

N_SHARDS = 32
RECS_PER_SHARD = 250

WORDS = (
    "the of and to a in that it is was for on are with as his they be at "
    "one have this from or had by word but what some we can out other were "
    "all there when up use your how said an each she which do their time if "
    "will way about many then them write would like so these her long make "
    "thing see him two has look more day could go come did number sound no "
    "most people my over know water than call first who may down side been "
    "now find any new work part take get place made live where after back"
).split()


def main() -> None:
    from energy_data_pipeline_spark.jobs.corpus_ingest import (
        crawl_to_silver_flow,
    )
    from energy_data_pipeline_spark.sources.wet import render_wet

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(12)
    base = tempfile.mkdtemp(prefix="wet_probe_")
    wet_dir = os.path.join(base, "wet")
    os.makedirs(wet_dir)
    n_total = N_SHARDS * RECS_PER_SHARD
    dup_text = " ".join(rng.choice(WORDS, size=80))
    for s in range(N_SHARDS):
        recs = []
        for r in range(RECS_PER_SHARD):
            rid = s * RECS_PER_SHARD + r
            roll = rng.rand()
            if roll < 0.05:
                text = "too short"
            elif roll < 0.15:
                text = dup_text
            else:
                text = " ".join(rng.choice(WORDS, size=80))
            recs.append(
                {
                    "warc_type": "conversion",
                    "record_id": f"<urn:uuid:{rid}>",
                    "target_uri": f"https://ex.com/{rid}",
                    "warc_date": "2024-01-01T00:00:00Z",
                    "text": text,
                }
            )
        with open(os.path.join(wet_dir, f"shard{s:03d}.warc.wet"), "wb") as f:
            f.write(render_wet(recs))

    corpus = os.path.join(base, "corpus")
    silver = os.path.join(base, "silver")
    flow = crawl_to_silver_flow(spark, wet_dir, corpus, silver, "tick1")
    r1 = flow.run()
    assert r1["status"] == "OK", r1
    t1 = {k: round(v.seconds, 2) for k, v in r1["tasks"].items()}
    flow2 = crawl_to_silver_flow(spark, wet_dir, corpus, silver, "tick2")
    r2 = flow2.run()
    assert r2["status"] == "OK", r2
    assert r2["results"]["admit"]["admitted"] == 0
    t2_total = round(sum(v.seconds for v in r2["tasks"].values()), 2)
    total1 = round(sum(v.seconds for v in r1["tasks"].values()), 2)
    results = {
        "n_records": n_total,
        "tick1_stage_s": t1,
        "tick1_total_s": total1,
        "tick1_docs_per_s": round(n_total / total1, 0),
        "tick2_noop_total_s": t2_total,
        "admitted": r1["results"]["admit"]["admitted"],
        "failed_quality": r1["results"]["admit"]["failed_quality"],
        "dups": r1["results"]["admit"]["dup_in_batch"]
        + r1["results"]["admit"]["dup_in_corpus"],
        "stats": r1["results"]["stats"],
    }
    shutil.rmtree(base, ignore_errors=True)
    out = "scale_probe_results.json"
    blob = json.load(open(out)) if os.path.exists(out) else {}
    blob["round12_wet_chain"] = results
    with open(out, "w") as f:
        json.dump(blob, f, indent=1)
        f.write("\n")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
