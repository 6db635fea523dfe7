"""Measure what epoch compaction actually buys
(streaming/state_compaction.py): a long-running dedup stream writes one
``epoch=N`` state partition per micro-batch, so the per-batch state
READ pays file-listing + footer-reading + scheduling costs linear in
the number of partitions even when the key volume is tiny. This tool
builds a synthetic plain-layout span state with E epochs x K keys,
times the state-read-and-anti-join a micro-batch performs, compacts,
and times it again — the number pair SURVEY cites.

Run: PYTHONPATH=/root/repo python tools/state_compaction_bench.py [epochs] [keys_per_epoch]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.session import get_spark
from kafka_connect_ftp_spark.streaming.span_dedup_stream import read_span_state
from kafka_connect_ftp_spark.streaming.state_compaction import compact_epoch_state


def _probe(spark, state_dir: str, reps: int = 3) -> float:
    """Median wall-clock of the per-batch state work: read the state,
    anti-join a small batch frame against it, count survivors."""
    batch = spark.range(1000).select(F.xxhash64("id").alias("h"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        seen = read_span_state(spark, state_dir)
        batch.join(seen, "h", "left_anti").count()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main() -> int:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("state_compaction_bench")
    work = tempfile.mkdtemp(prefix="compact_bench_")
    state = f"{work}/span_state"
    try:
        for e in range(epochs):
            spark.range(e * keys, (e + 1) * keys).select(
                F.xxhash64("id").alias("h")
            ).coalesce(1).write.parquet(f"{state}/epoch={e}")
        before = _probe(spark, state)
        t0 = time.perf_counter()
        res = compact_epoch_state(spark, state, keep_epochs=2)
        compact_sec = time.perf_counter() - t0
        after = _probe(spark, state)
        n_keys = read_span_state(spark, state).distinct().count()
        assert n_keys == epochs * keys, (n_keys, epochs * keys)
        import json

        print(
            json.dumps(
                {
                    "epochs": epochs,
                    "keys_per_epoch": keys,
                    "folded": len(res["folded"]),
                    "read_join_sec_before": round(before, 3),
                    "read_join_sec_after": round(after, 3),
                    "speedup": round(before / after, 2),
                    "compact_sec": round(compact_sec, 3),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
