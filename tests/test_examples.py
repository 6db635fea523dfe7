"""The composed example pipeline must keep running end to end — it is
the document of record for how the operators chain, so it must not rot."""

from __future__ import annotations

import os
import sys


def test_llm_data_prep_example_runs_end_to_end(spark, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__))))
    from examples.llm_data_prep import main

    # the example reads its sf_dir from argv; pytest's argv must not leak in
    monkeypatch.setattr(sys, "argv", ["llm_data_prep"])
    # reuses the session fixture's JVM (get_spark getOrCreate)
    assert main() == 0


def test_streaming_curation_example_runs_end_to_end(spark, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__))))
    from examples.streaming_curation import main

    monkeypatch.setattr(sys, "argv", ["streaming_curation"])
    assert main() == 0


def test_crawl_ingest_example_runs_end_to_end(spark, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__))))
    from examples.crawl_ingest import main

    monkeypatch.setattr(sys, "argv", ["crawl_ingest"])
    assert main() == 0
