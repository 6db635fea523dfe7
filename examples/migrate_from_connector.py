"""Migration demo: run the engine from an unmodified kafka-connect-ftp
style properties file.

Creates a local file tree, polls it twice with a mutation in between, and
prints the emitted records — the same records the connector would have
produced to Kafka (string/struct keys per ftp.keystyle).

Run: PYTHONPATH=. python examples/migrate_from_connector.py
"""

from __future__ import annotations

import os
import sys

# runnable from any cwd without PYTHONPATH: the repo root is this file's parent's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

from kafka_connect_ftp_spark.ingest.config import FtpEngineConfig
from kafka_connect_ftp_spark.ingest.converters import to_kafka_frame
from kafka_connect_ftp_spark.session import get_spark

PROPS = {
    # verbatim connector keys (example.properties style)
    "ftp.refresh": "PT1M",
    "ftp.file.maxage": "P14D",
    "ftp.keystyle": "struct",
    "ftp.monitor.tail": "/logs/:logs",
    "ftp.monitor.update": "/configs/:configs",
}


def main() -> int:
    spark = get_spark("migrate_demo")
    root = tempfile.mkdtemp()
    os.makedirs(f"{root}/logs")
    os.makedirs(f"{root}/configs")
    with open(f"{root}/logs/app.log", "wb") as fh:
        fh.write(b"started\n")
    with open(f"{root}/configs/limits.ini", "wb") as fh:
        fh.write(b"max=10")

    cfg = FtpEngineConfig.from_props(PROPS)
    pipe = cfg.build_pipeline(spark, tempfile.mkdtemp(), local_root=root)
    pipe.drop_empty = True

    print("== poll 1 (initial)")
    to_kafka_frame(pipe.poll(), cfg.key_converter_name).show(truncate=False)

    with open(f"{root}/logs/app.log", "ab") as fh:
        fh.write(b"request handled\n")
    os.utime(f"{root}/logs/app.log", (2_000_000_000, 2_000_000_000))

    print("== poll 2 (tail append -> suffix only)")
    to_kafka_frame(pipe.poll(), cfg.key_converter_name).show(truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
