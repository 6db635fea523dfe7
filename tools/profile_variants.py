"""Side-by-side physical-strategy timing harness.

Usage:
    PYTHONPATH=. python tools/profile_variants.py [sf_dir] query [query ...]

Times each named registry query twice (cold then warm) through a noop
write. The cold/warm split matters: the first run of a plan pays
whole-stage-codegen compilation and can read 3-4x slower than steady
state, so variant decisions must compare warm numbers.

Round 2 used this harness to pick the shipped forms of
simhash_fingerprint, text_profile, ngram_jaccard_pairs and
embedding_near_dup_pairs (each 2-4x faster than the round-1 shape; see
the git history of plans/ for the losing variants). To evaluate a new
variant, register it under a temporary name in its plans module, run
both names here, and keep the winner.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        print(__doc__)
        return 2

    from kafka_connect_ftp_spark.plans import registry
    from kafka_connect_ftp_spark.session import get_spark

    spark = get_spark("profile")
    spark.range(1).count()
    reg = registry()
    for name in names:
        for label in ("cold", "warm"):
            t0 = time.time()
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"{name} [{label}]: {time.time() - t0:.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
