"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline seconds>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...,
   "cdc_events_per_sec": ..., "scaling": {...}}

Also measures the north-rule scaling evidence — the same CDC apply job at
two parallelism levels (local[N] and local[4N]) on the same input — and
writes BENCH/BASELINE.md with both throughputs and the scaling efficiency.

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_SKIP_SCALING=1 to skip the two-parallelism run
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from nifi_tekst_bundle_spark.plans import catalog  # noqa: E402
from nifi_tekst_bundle_spark.operators import lww, resolve  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "cdc_lww_final_state",
    "q1_pricing_summary",
    "top_parts_by_revenue",
    "window_lww",
    "conv_fold",
    "docs_quality",
    "docs_minhash_sig",
    "docs_simhash",
    "ann_topk",
]

# replicate the derived event log so the CDC apply job is large enough to
# exercise shuffle parallelism at bench scale
CDC_MULTIPLIER = int(os.environ.get("BENCH_CDC_MULTIPLIER", "24"))


def make_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def force(df) -> int:
    """Fully materialize every column (noop sink — no driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def amplified_events(spark: SparkSession, sf_dir: str, multiplier: int):
    """Deterministic ×multiplier replication of the derived change log with
    unique lsns (copy i shifts lsn by i * 10^9) — same key space, so the
    LWW/merge contention pattern is preserved while volume scales."""
    ev = catalog.derive_change_events(spark, sf_dir)
    copies = F.explode(F.sequence(F.lit(0), F.lit(multiplier - 1))).alias("copy")
    amp = ev.select("*", copies).withColumn(
        "lsn", F.col("lsn") + F.col("copy").cast("long") * F.lit(1_000_000_000)
    ).drop("copy")
    return amp


def cdc_apply_job(spark: SparkSession, sf_dir: str, multiplier: int) -> tuple[float, int]:
    events = amplified_events(spark, sf_dir, multiplier)
    n_events = events.count()  # warm the scan; count separately from apply
    t0 = time.time()
    good, _dead = resolve.validate(events, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *catalog.CDC_PAYLOAD
    )
    regs = lww.batch_registers(normalized, catalog.CDC_PAYLOAD)
    final = lww.visible(regs, catalog.CDC_PAYLOAD)
    force(final)
    return time.time() - t0, n_events


def run_scaling(sf_dir: str, cpus: int) -> dict:
    low = max(cpus // 4, 2)
    out = {}
    for n in (low, cpus):
        spark = make_spark(n)
        try:
            # warm-up JVM/codegen with a small run, then measure
            cdc_apply_job(spark, sf_dir, 2)
            secs, n_events = cdc_apply_job(spark, sf_dir, CDC_MULTIPLIER)
            out[str(n)] = {
                "cores": n,
                "seconds": round(secs, 3),
                "events": n_events,
                "events_per_sec": round(n_events / secs, 1),
            }
        finally:
            spark.stop()
    eff = (
        out[str(cpus)]["events_per_sec"]
        / out[str(low)]["events_per_sec"]
        / (cpus / low)
    )
    out["scaling_efficiency"] = round(eff, 3)
    out["cores_ratio"] = cpus / low
    return out


def write_baseline_md(scaling: dict, queries: dict, sf_dir: str) -> None:
    os.makedirs(REPO / "BENCH", exist_ok=True)
    low = [k for k in scaling if k.isdigit()]
    low.sort(key=int)
    lo, hi = scaling[low[0]], scaling[low[-1]]
    lines = [
        "# BENCH/BASELINE.md — measured engine throughput + scaling evidence",
        "",
        f"Input: derived change log from `{sf_dir}/events.parquet`, ",
        f"replicated ×{CDC_MULTIPLIER} with unique lsns (same key space).",
        "",
        "## North-rule scaling criterion (sandbox evidence)",
        "",
        "Same CDC apply job (validate → resolve → LWW registers → visible",
        "state, fully materialized via the noop sink), same input, two",
        "parallelism levels:",
        "",
        "| cores | events | seconds | events/sec |",
        "|---|---|---|---|",
        f"| local[{lo['cores']}] | {lo['events']} | {lo['seconds']} | {lo['events_per_sec']} |",
        f"| local[{hi['cores']}] | {hi['events']} | {hi['seconds']} | {hi['events_per_sec']} |",
        "",
        f"**Throughput-scaling efficiency ({lo['cores']}→{hi['cores']} cores,"
        f" {scaling['cores_ratio']:.0f}×): {scaling['scaling_efficiency']}**"
        " (criterion: ≥ 0.8 between N and 4N).",
        "",
        "## Headline query seconds (local[%d], %s)" % (CPUS, sf_dir),
        "",
        "| query | seconds |",
        "|---|---|",
    ]
    for k, v in queries.items():
        lines.append(f"| {k} | {v} |")
    (REPO / "BENCH" / "BASELINE.md").write_text("\n".join(lines) + "\n")


def main() -> None:
    sf = SF_DIR.rstrip("/").split("/")[-1].replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = -1.0

    spark = make_spark(CPUS)
    qtimes: dict[str, float] = {}
    try:
        for name in HEADLINE:
            fn = catalog.QUERIES[name]
            t0 = time.time()
            force(fn(spark, SF_DIR))
            qtimes[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()

    result = {
        "metric": "headline_queries_total_seconds",
        "value": round(sum(qtimes.values()), 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_val,
    }

    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        scaling = run_scaling(SF_DIR, CPUS)
        result["scaling"] = scaling
        hi = scaling[str(CPUS)]
        result["cdc_events_per_sec"] = hi["events_per_sec"]
        write_baseline_md(scaling, qtimes, SF_DIR)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
