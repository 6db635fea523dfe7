"""End-to-end corpus dedup: minhash signatures → LSH candidates →
estimated Jaccard cut → connected components → keeper decision.

Run: PYTHONPATH=. python examples/dedup_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

# runnable from any cwd without PYTHONPATH: the repo root is this file's parent's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.dedup_cluster import dedup_decision
from kafka_connect_ftp_spark.operators.text_dedup import (
    estimated_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
)
from kafka_connect_ftp_spark.session import get_spark, load_tables


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dedup_corpus")
    docs = load_tables(spark, sf_dir, "documents")["documents"]

    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=16).cache()
    candidates = lsh_candidate_pairs(sig, band_size=4)
    # verify candidates with the sketch estimate before clustering
    pairs = estimated_jaccard(sig, candidates).filter(F.col("est_jaccard") >= 0.5)
    decision = dedup_decision(pairs, docs.select("doc_id"))

    total = decision.count()
    kept = decision.filter("keep").count()
    print(f"{total} docs -> {kept} kept ({total - kept} near-duplicates removed)")
    decision.filter(~F.col("keep")).orderBy("doc_id").show(5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
