"""Time EVERY registry query (build + execution split) through a noop
write — the round-12 audit pass over the non-headline registry entries
that bench.py does not cover.

Usage: PYTHONPATH=. python tools/profile_all.py [sf_dir] [runs]

Per query: runs+1 samples; prints min-of-first-runs (bench semantics),
warm min (samples[1:]), and the per-sample build/total arrays. Order is
registry order. Queries are labelled in the (disabled-by-default) UI via
setJobDescription for ad-hoc profiling sessions with the UI enabled.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from kafka_connect_ftp_spark.plans import registry
    from kafka_connect_ftp_spark.session import get_spark

    spark = get_spark("profile_all")
    spark.range(1).count()
    reg = registry()
    out = {}
    for name, spec in reg.items():
        samples, builds = [], []
        for _ in range(runs + 1):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            builds.append(round(time.time() - t0, 3))
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "min": min(samples[:runs]),
            "warm": min(samples[1:]),
            "build": builds,
            "samples": samples,
        }
        print(
            f"{name}: min={out[name]['min']:.3f} warm={out[name]['warm']:.3f} "
            f"builds={builds} samples={samples}",
            flush=True,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
